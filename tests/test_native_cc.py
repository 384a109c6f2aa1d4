"""Connected-components: native C++ vs pure-JAX vs scipy oracle."""

import numpy as np
import pytest

from videopainter_tpu.native import (connected_components_jax,
                                     connected_components_native,
                                     fill_holes_in_mask_scores,
                                     get_connected_components)


def make_mask(seed=0, b=2, h=40, w=56, p=0.4):
    rng = np.random.RandomState(seed)
    return (rng.rand(b, 1, h, w) < p).astype(np.uint8)


def scipy_reference(mask):
    from scipy import ndimage

    b = mask.shape[0]
    labels = np.zeros_like(mask, np.int32)
    areas = np.zeros_like(mask, np.int32)
    structure = np.ones((3, 3), int)  # 8-connectivity
    for i in range(b):
        lab, n = ndimage.label(mask[i, 0], structure=structure)
        counts = np.bincount(lab.ravel())
        labels[i, 0] = lab
        ar = counts[lab]
        ar[lab == 0] = 0
        areas[i, 0] = ar
    return labels, areas


def assert_equivalent_labeling(labels, ref_labels):
    """Same partition (label ids may differ)."""
    assert (labels > 0).sum() == (ref_labels > 0).sum()
    fg = ref_labels > 0
    pairs = set(zip(labels[fg].ravel().tolist(), ref_labels[fg].ravel().tolist()))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


@pytest.mark.parametrize("seed,p", [(0, 0.4), (1, 0.7), (2, 0.1)])
def test_native_matches_scipy(seed, p):
    mask = make_mask(seed, p=p)
    labels, areas = connected_components_native(mask)
    ref_labels, ref_areas = scipy_reference(mask)
    assert_equivalent_labeling(labels, ref_labels)
    np.testing.assert_array_equal(areas, ref_areas)


def test_jax_matches_scipy():
    mask = make_mask(3, p=0.5)
    labels, areas = connected_components_jax(mask)
    ref_labels, ref_areas = scipy_reference(mask)
    assert_equivalent_labeling(labels, ref_labels)
    np.testing.assert_array_equal(areas, ref_areas)


def test_dispatcher_and_edge_cases():
    empty = np.zeros((1, 1, 8, 8), np.uint8)
    labels, areas = get_connected_components(empty)
    assert labels.sum() == 0 and areas.sum() == 0
    full = np.ones((1, 1, 8, 8), np.uint8)
    labels, areas = get_connected_components(full)
    assert (labels == 1).all() and (areas == 64).all()


def test_fill_holes():
    mask = np.ones((32, 32), np.uint8)
    mask[10:12, 10:12] = 0        # 4-px hole -> filled
    mask[0:20, 0] = 0
    mask[:, 20:] = 0              # big background region -> kept
    out = fill_holes_in_mask_scores(mask, max_area=8)
    assert out[10, 10] == 1       # hole filled
    assert out[0, 25] == 0        # large background untouched
    speck = np.zeros((32, 32), np.uint8)
    speck[5, 5] = 1               # single-pixel speck -> removed
    speck[20:30, 20:30] = 1
    out2 = fill_holes_in_mask_scores(speck, max_area=4)
    assert out2[5, 5] == 0 and out2[25, 25] == 1
