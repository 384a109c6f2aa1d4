"""Dataset prep tooling: CSV-driven video download + archive extraction.

Reference: data_utils/VPData_download.py (CSV rows with url + path columns,
requests streaming download) and data_utils/unzip_folder.py.
"""

from __future__ import annotations

import argparse
import os
import zipfile


def download_videos(meta_file_path: str, out_dir: str, url_col: str = "url",
                    path_col: str = "path", overwrite: bool = False) -> int:
    import pandas as pd

    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise ImportError("requests required for downloading") from e

    df = pd.read_csv(meta_file_path)
    n = 0
    for _, row in df.iterrows():
        dst = os.path.join(out_dir, str(row[path_col]))
        if os.path.exists(dst) and not overwrite:
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with requests.get(str(row[url_col]), stream=True, timeout=60) as r:
            r.raise_for_status()
            with open(dst, "wb") as f:
                for chunk in r.iter_content(1 << 20):
                    f.write(chunk)
        n += 1
    return n


def unzip_folder(src_dir: str, dst_dir: str) -> int:
    n = 0
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".zip"):
            continue
        with zipfile.ZipFile(os.path.join(src_dir, name)) as z:
            z.extractall(os.path.join(dst_dir, name[:-4]))
        n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--meta_file_path", required=True)
    d.add_argument("--out_dir", required=True)
    u = sub.add_parser("unzip")
    u.add_argument("--src_dir", required=True)
    u.add_argument("--dst_dir", required=True)
    args = ap.parse_args()
    if args.cmd == "download":
        print(download_videos(args.meta_file_path, args.out_dir), "files")
    else:
        print(unzip_folder(args.src_dir, args.dst_dir), "archives")
