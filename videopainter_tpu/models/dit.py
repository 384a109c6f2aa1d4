"""CogVideoX spatiotemporal diffusion transformer (DiT) — TPU-native.

Reimplements the behavior of CogVideoXTransformer3DModel
(cogvideox_transformer_3d.py:218-646) as pure functions over a parameter
pytree:

 - joint [text(226) ‖ video] token sequence, AdaLN-Zero conditioning
 - per-layer branch-feature injection with optional mask gating (:596-609)
 - resample-mask construction for ID-resampling attention (:534-548)
 - cross-clip `prev_hidden_states` attention kwargs (:574-582, block :141-146)
 - self-guidance hidden-state swap (:593-594)
 - per-layer hidden-state capture for the any-length pipeline (:611-612)

TPU-first design: the 42 blocks run under one `jax.lax.scan` over stacked
block parameters (compile once, not 42×), with per-layer branch features
gathered by a precomputed index array. Optional `jax.checkpoint` rematerializes
blocks during training. Attention is the ops/attention contract (einsum
reference or Pallas flash).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TransformerConfig
from ..ops.attention import init_attention, joint_attention
from ..ops.basic import init_layer_norm, init_linear, layer_norm, linear
from ..ops.embeddings import init_timestep_mlp, timestep_embedding, timestep_mlp
from ..ops.feed_forward import feed_forward, init_feed_forward
from ..ops.norms import ada_layer_norm, init_ada_layer_norm, init_layer_norm_zero, layer_norm_zero
from ..ops.patch_embed import init_patch_embed, patch_embed, unpatchify
from ..ops.sincos import get_3d_sincos_pos_embed


# Resident padded-sequence fast path: the joint [text ‖ video] sequence is
# padded ONCE to the flash-attention block multiple (lcm of blk_q=512 and
# blk_k=2048) and stays padded across all layers, instead of every layer's
# attention padding q/k/v and slicing the output (~18 ms/layer of HBM copies
# at flagship dims). Exact for real tokens: the kernel masks keys past
# kv_valid_len exactly as the per-layer padding did, pad rows never feed real
# outputs, and the tail is sliced off before the output head. (Results can
# differ from the unpadded path by matmul-reassociation ulps only — the
# dense ops see a different row count, which may change the backend's gemm
# blocking; the computed quantities are identical.)
_SEQ_PAD_MULTIPLE = 2048


def crop_pos_embedding(pos, cfg, text_len: int, num_frames: int,
                       height: int, width: int):
    """Size the stored joint sincos table to the actual input.

    The reference RECOMPUTES the table when the input dims differ from the
    sample dims (embeddings.py:440-449); with equal latent H/W and fewer
    frames the recomputed table is bit-identical to a prefix crop (text rows
    are zeros, video rows are t-major with the same per-frame grid), so crop.
    Mirrors the reference's ValueError for a spatial mismatch under learned
    positional embeddings (embeddings.py:436-439)."""
    if pos is None:
        return None
    p = cfg.patch_size
    s_vid = num_frames * (height // p) * (width // p)
    need = text_len + s_vid
    if pos.shape[1] == need:
        return pos
    if (height != cfg.sample_height or width != cfg.sample_width
            or text_len != cfg.max_text_seq_length or pos.shape[1] < need):
        raise ValueError(
            f"positional-embedding table ({pos.shape[1]} tokens) cannot be "
            f"cropped to the input ({need} tokens: text {text_len}, video "
            f"{num_frames}x{height // p}x{width // p}): only a shorter video "
            f"at the sample spatial dims ({cfg.sample_height}x"
            f"{cfg.sample_width}) and full text length "
            f"({cfg.max_text_seq_length}) is a prefix of the stored table")
    return pos[:, :need]


def _joint_identity_rope(rope, text_len: int, s_total: int):
    """Extend the video cos/sin tables to the full (padded) joint sequence
    with identity rows (cos=1, sin=0) over the text segment and pad tail.
    apply_rotary_emb then runs in ONE shot over the sequence — x*1 +
    rotate(x)*0 == x bit-exactly — removing the per-layer text/video
    slice+concat copies (ops/attention._rope_video_slice fast path)."""
    cos, sin = rope
    d = cos.shape[-1]
    tail = s_total - text_len - cos.shape[0]
    cos_j = jnp.concatenate(
        [jnp.ones((text_len, d), cos.dtype), cos,
         jnp.ones((tail, d), cos.dtype)], axis=0)
    sin_j = jnp.concatenate(
        [jnp.zeros((text_len, d), sin.dtype), sin,
         jnp.zeros((tail, d), sin.dtype)], axis=0)
    return cos_j, sin_j


# ---------------------------------------------------------------------------
# Single block
# ---------------------------------------------------------------------------

def dit_block(
    bp: dict,
    hidden_states: jnp.ndarray,                 # [B, S_vid, D]
    encoder_hidden_states: Optional[jnp.ndarray],  # [B, S_text, D] | None
    temb: jnp.ndarray,                          # [B, time_embed_dim]
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    *,
    num_heads: int,
    norm_eps: float = 1e-5,
    resample_mask: Optional[jnp.ndarray] = None,
    prev_hidden_states: Optional[jnp.ndarray] = None,   # [B, S_joint, D] raw (pre-norm)
    prev_clip_weight: Optional[Any] = None,
    prev_resample_mask: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    ring_axis: Optional[str] = None,
    ring_mesh=None,
    kv_valid_len: Optional[int] = None,
):
    """One CogVideoXBlock (cogvideox_transformer_3d.py:125-216).

    encoder_hidden_states=None selects the `forward_wo_text` path (:186-216).
    Returns (hidden_states, encoder_hidden_states|None).
    """
    wo_text = encoder_hidden_states is None
    text_len = 0 if wo_text else encoder_hidden_states.shape[1]

    norm_h, norm_e, gate_msa, enc_gate_msa = layer_norm_zero(
        bp["norm1"], hidden_states, encoder_hidden_states, temb, eps=norm_eps)

    norm_prev = None
    if prev_hidden_states is not None:
        # Block re-norms the raw previous-clip hidden states with norm1 and the
        # current temb before attention (cogvideox_transformer_3d.py:141-146).
        p_enc, p_vid = prev_hidden_states[:, :text_len], prev_hidden_states[:, text_len:]
        np_vid, np_enc, _, _ = layer_norm_zero(bp["norm1"], p_vid, p_enc, temb, eps=norm_eps)
        norm_prev = jnp.concatenate([np_enc, np_vid], axis=1)

    attn_h, attn_e = joint_attention(
        bp["attn1"], norm_h, norm_e,
        num_heads=num_heads, rope=rope,
        resample_mask=resample_mask,
        prev_hidden_states=norm_prev,
        prev_clip_weight=prev_clip_weight,
        prev_resample_mask=prev_resample_mask,
        use_flash=use_flash, ring_axis=ring_axis, ring_mesh=ring_mesh,
        kv_valid_len=kv_valid_len,
    )

    hidden_states = hidden_states + gate_msa * attn_h
    if not wo_text:
        encoder_hidden_states = encoder_hidden_states + enc_gate_msa * attn_e

    norm_h, norm_e, gate_ff, enc_gate_ff = layer_norm_zero(
        bp["norm2"], hidden_states, encoder_hidden_states, temb, eps=norm_eps)

    if wo_text:
        ff_out = feed_forward(bp["ff"], norm_h)
        hidden_states = hidden_states + gate_ff * ff_out
        return hidden_states, None

    ff_out = feed_forward(bp["ff"], jnp.concatenate([norm_e, norm_h], axis=1))
    hidden_states = hidden_states + gate_ff * ff_out[:, text_len:]
    encoder_hidden_states = encoder_hidden_states + enc_gate_ff * ff_out[:, :text_len]
    return hidden_states, encoder_hidden_states


def init_dit_block(key, cfg: TransformerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    d = cfg.inner_dim
    return {
        "norm1": init_layer_norm_zero(ks[0], cfg.time_embed_dim, d,
                                      elementwise_affine=cfg.norm_elementwise_affine, dtype=dtype),
        "attn1": init_attention(ks[1], d, num_heads=cfg.num_attention_heads,
                                qk_norm=True, bias=cfg.attention_bias, dtype=dtype),
        "norm2": init_layer_norm_zero(ks[2], cfg.time_embed_dim, d,
                                      elementwise_affine=cfg.norm_elementwise_affine, dtype=dtype),
        "ff": init_feed_forward(ks[3], d, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# Full transformer
# ---------------------------------------------------------------------------

class TransformerOutput(NamedTuple):
    sample: jnp.ndarray                               # [B, T, H, W, out_C]
    hidden_states_list: Optional[jnp.ndarray] = None  # [L, B, S_joint, D]
    resample_mask: Optional[jnp.ndarray] = None       # bool [B, S_joint]
    calib_amax: Optional[jnp.ndarray] = None          # [L, n_sites] (calibrate=True)


class CogVideoXTransformer3D:
    """Functional model wrapper: `init` builds the param pytree, `apply` runs it.

    Patch-embed input channels can exceed cfg.in_channels (the SFT-inpaint
    variant widens to in_channels*2+1, cogvideox_transformer_3d_inpainting.py:253-268)
    via `patch_in_channels`.
    """

    def __init__(self, cfg: TransformerConfig, patch_in_channels: Optional[int] = None):
        self.cfg = cfg
        self.patch_in_channels = patch_in_channels or cfg.in_channels

    # -- init ---------------------------------------------------------------
    def host_pos_embedding(self) -> Optional[np.ndarray]:
        """The joint sincos table as HOST numpy, or None if the config needs
        none. Pass this as a jit ARGUMENT when calling init under jax.jit:
        inlined as a closure/constant, the [1, 17776, 3072] table makes the
        init HLO exceed the axon remote-compile request limit (HTTP 413)."""
        cfg = self.cfg
        if cfg.use_rotary_positional_embeddings and \
                not cfg.use_learned_positional_embeddings:
            return None
        return self._positional_embeddings(cfg.sample_height, cfg.sample_width,
                                           cfg.sample_frames)

    def init(self, key, dtype=jnp.float32, pos_embedding=None) -> dict:
        cfg = self.cfg
        ks = jax.random.split(key, 6 + cfg.num_layers)
        params: Dict[str, Any] = {
            "patch_embed": init_patch_embed(
                ks[0], patch_size=cfg.patch_size, in_channels=self.patch_in_channels,
                embed_dim=cfg.inner_dim, text_embed_dim=cfg.text_embed_dim, dtype=dtype),
            "time_embedding": init_timestep_mlp(ks[1], cfg.inner_dim, cfg.time_embed_dim, dtype=dtype),
            "norm_final": init_layer_norm(cfg.inner_dim, affine=cfg.norm_elementwise_affine, dtype=dtype),
            "norm_out": init_ada_layer_norm(ks[2], cfg.time_embed_dim, 2 * cfg.inner_dim,
                                            elementwise_affine=cfg.norm_elementwise_affine, dtype=dtype),
            "proj_out": init_linear(ks[3], cfg.inner_dim,
                                    cfg.patch_size * cfg.patch_size * cfg.out_channels, dtype=dtype),
        }
        blocks = [init_dit_block(ks[6 + i], cfg, dtype=dtype) for i in range(cfg.num_layers)]
        params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        if not cfg.use_rotary_positional_embeddings or cfg.use_learned_positional_embeddings:
            if pos_embedding is None:
                # eager path: compute host-side (float64 sincos). Under jit,
                # pass host_pos_embedding() as an argument instead — baked in
                # as a constant it blows the remote-compile request size.
                pos_embedding = self._positional_embeddings(
                    cfg.sample_height, cfg.sample_width, cfg.sample_frames)
            params["patch_embed"]["pos_embedding"] = jnp.asarray(
                pos_embedding, dtype=dtype)
        return params

    def _positional_embeddings(self, sample_height, sample_width, sample_frames) -> np.ndarray:
        """Joint [text-zeros ‖ 3D-sincos] table (embeddings.py:380-398)."""
        cfg = self.cfg
        p = cfg.patch_size
        post_h = sample_height // p
        post_w = sample_width // p
        post_t = (sample_frames - 1) // cfg.temporal_compression_ratio + 1
        pe = get_3d_sincos_pos_embed(
            cfg.inner_dim, (post_w, post_h), post_t,
            cfg.spatial_interpolation_scale, cfg.temporal_interpolation_scale)
        pe = pe.reshape(-1, cfg.inner_dim)
        joint = np.zeros((1, cfg.max_text_seq_length + pe.shape[0], cfg.inner_dim), dtype=np.float32)
        joint[0, cfg.max_text_seq_length:] = pe
        return joint

    # -- apply --------------------------------------------------------------
    def apply(
        self,
        params: dict,
        hidden_states: jnp.ndarray,            # [B, T, H, W, C_in] latents (channel-last)
        encoder_hidden_states: jnp.ndarray,    # [B, S_text, text_dim]
        timestep: jnp.ndarray,                 # [B] or scalar
        *,
        rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        branch_block_samples: Optional[jnp.ndarray] = None,   # [n_branch, B, S_vid, D]
        branch_block_masks: Optional[jnp.ndarray] = None,     # [B, T_lat, H, W] float
        add_first: bool = False,
        self_guidance_hidden_states: Optional[jnp.ndarray] = None,  # [L, B, S_vid, D]
        self_guidance_masks: Optional[jnp.ndarray] = None,    # [B, T_lat, H, W] float
        prev_hidden_states: Optional[Any] = None,             # [L, B, S_joint, D]
                                                              # or [L, B, M, D] compressed, or
                                                              # {"values": int8, "scales": f32}
        prev_clip_weight: Optional[Any] = None,
        prev_resample_mask: Optional[jnp.ndarray] = None,     # bool [B, S_joint]
        prev_hidden_indices: Optional[jnp.ndarray] = None,    # int32 [B, M]: joint-seq
                                                              # positions of compressed prev states
        id_pool_resample: bool = False,
        return_hidden_states: bool = False,
        capture_indices: Optional[jnp.ndarray] = None,        # int32 [B, M]: capture only
                                                              # these joint-seq positions
        capture_quant: bool = False,                          # int8 per-token capture
                                                              # (halves the stored state again)
        use_flash: bool = False,
        remat: bool = False,
        remat_chunk: Optional[int] = None,  # layers per checkpointed group:
                                # two-level (sqrt) remat — see the scan below
        seq_axis: Optional[str] = None,
        ring_mesh=None,
        resident: Optional[bool] = None,  # resident padded sequence; None =
                                # auto (see below). Numerics exact either way.
        calibrate: bool = False,  # collect per-layer per-site activation amax
                                # from the DYNAMIC int8 linears (see
                                # quantize.calibrate_ascales); plain path only
    ) -> TransformerOutput:
        """seq_axis: mesh axis name for GSPMD sequence parallelism - video
        tokens are sharding-constrained to P(None, seq_axis, None) at the
        patchify boundary and after every block, so block compute (FFN, AdaLN,
        projections) distributes over tokens and XLA inserts the KV
        all-gathers for attention (scaling-book recipe; the reference has no
        sequence parallelism at all, SURVEY.md section 2f).
        ring_mesh: additionally route attention through shard_map ring
        attention (video KV rotates over ICI via ppermute, text folded in
        once) - zero KV all-gather memory; requires seq_axis."""
        cfg = self.cfg
        if (prev_hidden_indices is not None or isinstance(prev_hidden_states, dict)) \
                and prev_hidden_states is not None \
                and not cfg.id_pool_resample_learnable:
            raise ValueError(
                "compressed prev_hidden_states (prev_hidden_indices) are only "
                "valid on the ID-resample path: the base-processor prev-clip "
                "blend reads full-sequence prev KV (ops/attention.py:164-185)")
        if calibrate and (return_hidden_states or remat
                          or prev_hidden_states is not None
                          or id_pool_resample
                          or self_guidance_hidden_states is not None):
            # calibration reads the tap in plain-path call order; the variant
            # paths add extra to_k/to_v calls (ops/attention.py:147-204) and
            # remat re-traces the block, both of which would scramble the
            # site mapping. Calibrate on the plain serving forward.
            raise ValueError("calibrate=True requires the plain forward path "
                             "(no captures, variants, or remat)")
        if prev_hidden_states is not None and prev_clip_weight is None:
            # fail loudly: the attention variant selection keys on BOTH
            # (ops/attention.py has_prev) — without a weight the prev states
            # would be silently ignored, a quiet quality bug (caught by the
            # GATE_int8 consumption control, round 3)
            raise ValueError(
                "prev_hidden_states requires prev_clip_weight (the reference "
                "anyl pipeline always passes both, ..._anyl.py:962-966)")
        b, num_frames, height, width, _ = hidden_states.shape
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))

        # 1. time embedding (computed fp32, cast to activation dtype)
        t_emb = timestep_embedding(timestep, cfg.inner_dim,
                                   flip_sin_to_cos=cfg.flip_sin_to_cos,
                                   downscale_freq_shift=cfg.freq_shift)
        t_emb = t_emb.astype(hidden_states.dtype)
        emb = timestep_mlp(params["time_embedding"], t_emb)

        # 2. patch embedding (+ optional mask pooling)
        masks_in = self_guidance_masks if self_guidance_masks is not None else branch_block_masks
        pos = crop_pos_embedding(params["patch_embed"].get("pos_embedding"),
                                 cfg, encoder_hidden_states.shape[1],
                                 num_frames, height, width)
        embeds, patch_mask = patch_embed(
            params["patch_embed"], encoder_hidden_states, hidden_states,
            patch_size=cfg.patch_size, masks=masks_in, pos_embedding=pos)

        text_len = encoder_hidden_states.shape[1]
        enc_h = embeds[:, :text_len]
        h = embeds[:, text_len:]
        s_vid = h.shape[1]
        if seq_axis is not None:
            from jax.sharding import PartitionSpec as _P
            _sp = lambda x: jax.lax.with_sharding_constraint(
                x, _P(None, seq_axis, None))
        else:
            _sp = lambda x: x
        h = _sp(h)

        # resample-mask over the joint sequence (:534-548)
        resample_mask = None
        if id_pool_resample or return_hidden_states or prev_resample_mask is not None:
            if patch_mask is not None:
                resample_mask = jnp.concatenate(
                    [jnp.zeros((b, text_len), dtype=bool), patch_mask], axis=1)

        attn_resample_mask = resample_mask if (id_pool_resample and cfg.id_pool_resample_learnable) else None
        if not cfg.id_pool_resample_learnable:
            prev_rs = None
        else:
            prev_rs = prev_resample_mask

        # Resident padded sequence (see _SEQ_PAD_MULTIPLE). All flash paths
        # run resident: the base path masks keys past kv_valid_len, the
        # resample variants' concatenated masked-KV page uses the kernel's
        # PAGED mask ((i % S_pad) < kv_len, ops/flash_attention._kv_valid),
        # and the prev-clip blend's two flash calls each take the plain
        # kv_len. Ring/SP shards and the self-guidance swap (whose captured
        # states are true-length [L, B, S_vid, D]) stay unpadded. The
        # RETURNED resample_mask and hidden-state captures stay true-length.
        if resident is None:
            # Measured on v5e at flagship dims (CLAUDE.md): the resident
            # padding's +3.7% rows cost the int8 modes MORE (per-token
            # activation quantize + int8 dense scale with rows) than the
            # saved per-layer pad copies — plain int8 forward 7477 vs
            # 7583 ms/step resident — while bf16 nets the other way
            # (8494 resident vs 8611). The variant paths (prev/resample/
            # captures) keep residency: it also removes their double-page
            # per-layer pad copies, lowering the transient-memory peak
            # (those windows are the single-chip fit-critical ones).
            plain = (prev_hidden_states is None and not id_pool_resample
                     and not return_hidden_states
                     and prev_resample_mask is None)
            resident = not (use_flash in ("int8", "int8pv") and plain)
        kv_valid_len = None
        seq_pad = 0
        if (resident and use_flash and ring_mesh is None and seq_axis is None
                and self_guidance_hidden_states is None):
            s_joint = text_len + s_vid
            padded_len = -(-s_joint // _SEQ_PAD_MULTIPLE) * _SEQ_PAD_MULTIPLE
            seq_pad = padded_len - s_joint
            if seq_pad:
                kv_valid_len = s_joint
                h = jnp.pad(h, ((0, 0), (0, seq_pad), (0, 0)))
                if patch_mask is not None:
                    patch_mask = jnp.pad(patch_mask, ((0, 0), (0, seq_pad)))
                if branch_block_samples is not None:
                    branch_block_samples = jnp.pad(
                        branch_block_samples,
                        ((0, 0), (0, 0), (0, seq_pad), (0, 0)))
                if attn_resample_mask is not None:
                    attn_resample_mask = jnp.pad(attn_resample_mask,
                                                 ((0, 0), (0, seq_pad)))
                if prev_rs is not None:
                    prev_rs = jnp.pad(prev_rs, ((0, 0), (0, seq_pad)))
            if rope is not None:
                rope = _joint_identity_rope(rope, text_len,
                                            text_len + s_vid + seq_pad)

        # Per-layer branch index: i // ceil(L / n_branch), or i if add_first (:596-609)
        n_layers = cfg.num_layers
        if branch_block_samples is not None:
            nb = branch_block_samples.shape[0]
            if add_first:
                bidx = np.minimum(np.arange(n_layers), nb - 1)
                bvalid = (np.arange(n_layers) < nb)
            else:
                interval = int(math.ceil(n_layers / nb))
                bidx = np.arange(n_layers) // interval
                bvalid = np.ones(n_layers, dtype=bool)
            bidx = jnp.asarray(bidx, dtype=jnp.int32)
            bvalid = jnp.asarray(bvalid)

        gate_mask = None  # True where masked region (no injection there)
        if patch_mask is not None:
            gate_mask = patch_mask[..., None]  # [B, S_vid, 1]

        num_heads = cfg.num_attention_heads
        norm_eps = cfg.norm_eps

        def run_block(bp, h, enc_h, layer_idx):
            prev_h = None
            if prev_hidden_states is not None:
                if isinstance(prev_hidden_states, dict):
                    # int8 per-token capture: dequantize this layer's page
                    prev_h = (prev_hidden_states["values"][layer_idx]
                              .astype(jnp.float32)
                              * prev_hidden_states["scales"][layer_idx][..., None]
                              ).astype(h.dtype)
                else:
                    prev_h = prev_hidden_states[layer_idx]
                if prev_hidden_indices is not None:
                    # Compressed cross-window state: only masked-region tokens
                    # were captured — they are the only positions the resample
                    # processor reads (prev_resample_mask zeroes the rest
                    # either way, ops/attention.py:133-134), so scattering
                    # them into a zero joint-sequence buffer is bit-exact.
                    s_joint = text_len + s_vid
                    if seq_pad:
                        # resident mode: build the buffer at the padded length
                        # directly; the pipelines' dump slot s_joint lands in
                        # the pad region, which prev_rs zeroes and the
                        # kernel's paged mask excludes — no slice copy
                        full = jnp.zeros((b, s_joint + seq_pad,
                                          prev_h.shape[-1]), prev_h.dtype)
                        prev_h = full.at[jnp.arange(b)[:, None],
                                         prev_hidden_indices].set(prev_h)
                    else:
                        # pad indices land in the extra slot S_joint, sliced
                        full = jnp.zeros((b, s_joint + 1, prev_h.shape[-1]),
                                         prev_h.dtype)
                        full = full.at[jnp.arange(b)[:, None],
                                       prev_hidden_indices].set(prev_h)
                        prev_h = full[:, :s_joint]
                elif seq_pad:
                    # full-sequence prev state arrives true-length; pad this
                    # layer's page to the resident length (tail keys are
                    # masked in-kernel)
                    prev_h = jnp.pad(prev_h, ((0, 0), (0, seq_pad), (0, 0)))
            h, enc_h = dit_block(
                bp, h, enc_h, emb, rope,
                num_heads=num_heads, norm_eps=norm_eps,
                resample_mask=attn_resample_mask,
                prev_hidden_states=prev_h,
                prev_clip_weight=prev_clip_weight,
                prev_resample_mask=prev_rs,
                use_flash=use_flash,
                ring_axis=seq_axis if ring_mesh is not None else None,
                ring_mesh=ring_mesh,
                kv_valid_len=kv_valid_len,
            )
            if self_guidance_hidden_states is not None:
                sg = self_guidance_hidden_states[layer_idx]
                h = jnp.where(gate_mask, h, sg)  # swap background (:593-594)
            if branch_block_samples is not None:
                bs = jnp.take(branch_block_samples, bidx[layer_idx], axis=0)
                valid = bvalid[layer_idx]
                injected = h + bs.astype(h.dtype) * valid.astype(h.dtype)
                if gate_mask is not None:
                    h = jnp.where(gate_mask, h, injected)
                else:
                    h = injected
            return _sp(h), enc_h

        def scan_body(carry, xs):
            h, enc_h = carry
            bp, layer_idx = xs
            fn = run_block
            if remat:
                fn = jax.checkpoint(run_block)
            if calibrate:
                from ..ops.basic import _set_calib_tap
                taps: list = []
                prev_tap = _set_calib_tap(taps)
                try:
                    h, enc_h = fn(bp, h, enc_h, layer_idx)
                finally:
                    _set_calib_tap(prev_tap)
                if not taps:
                    raise ValueError(
                        "calibrate=True but no dynamic int8 linear ran — "
                        "quantize the params first (quantize_transformer_int8) "
                        "and don't pre-attach static scales")
                return (h, enc_h), jnp.stack(taps)
            h, enc_h = fn(bp, h, enc_h, layer_idx)
            ys = None
            if return_hidden_states:
                ys = jnp.concatenate([enc_h, h], axis=1)
                if seq_pad and capture_indices is None:
                    # captures are a cross-window contract: stay true-length
                    ys = ys[:, :text_len + s_vid]
                if capture_indices is not None:
                    # compressed capture: keep only the masked-region tokens
                    # (pad slots gather a clamped in-range token; the
                    # consumer's scatter drops them)
                    idx = jnp.clip(capture_indices, 0, ys.shape[1] - 1)
                    ys = jnp.take_along_axis(ys, idx[..., None], axis=1)
                if capture_quant:
                    # per-token symmetric int8 (scale = max|x|/127 over D):
                    # ~0.4% relative error on the stored state, in line with
                    # the W8A8 serving mode that consumes it through int8
                    # projections anyway
                    y32 = ys.astype(jnp.float32)
                    sc = jnp.maximum(jnp.max(jnp.abs(y32), axis=-1), 1e-8) / 127.0
                    ys = {"values": jnp.round(y32 / sc[..., None]).astype(jnp.int8),
                          "scales": sc}
            return (h, enc_h), ys

        layer_ids = jnp.arange(n_layers)
        xs = (params["blocks"], layer_ids)
        if (remat and remat_chunk and not calibrate
                and remat_chunk < n_layers):
            # Two-level (sqrt) rematerialization: the flat scan's backward
            # keeps every layer's carry resident ([L, B, S_pad, D] x2 —
            # ~5 GB bf16 at 42L flagship dims), part of what OOMs bf16
            # training on one chip (TRAIN_SMOKE.json bf16 ladder). Running
            # GROUPS of `remat_chunk` layers under jax.checkpoint bounds the
            # live residuals to G group inputs + one group's per-block
            # carries ((L/chunk + chunk) states, minimized near
            # chunk=sqrt(L)) at the cost of one extra in-group forward
            # during the backward pass. Numerics identical.
            #
            # The groups are a PYTHON-unrolled loop, and each group slices
            # its layers from the ORIGINAL stacked tree with static indices
            # INSIDE its checkpoint region: a checkpointed fn saves its
            # inputs as residuals, so feeding it the unmodified param input
            # aliases the resident weights. (The first implementation
            # reshaped the stack to [G, chunk, ...] and scanned groups —
            # the reshaped tree is a COMPUTED value, so remat saved a full
            # HLO-temp COPY of every kernel stack: +6x756 MB on chip,
            # measured OOM at 42L. Do not reintroduce the reshape.)
            # ceil-divide: the LAST group may be smaller (42 % 7 == 0 but
            # e.g. 32 with chunk 7 gets groups 7,7,7,7,4). An earlier
            # version silently fell back to the flat scan on non-divisible
            # depths — a quiet no-op that made "rc7" ladder rungs at 32/24L
            # run without grouping at all.
            g = -(-n_layers // remat_chunk)

            def group_fn(carry, blocks_all, lo, size):
                # gather ONE layer's params at a time inside the inner scan.
                # A group-sized lax.slice here materializes [chunk, d, 4d]
                # kernel copies as HLO temps, and XLA schedules every
                # group's slices concurrently: measured 288 MB x ~2/group
                # x G groups (~5 GiB at 28L, ~9 GiB at 42L) — the real
                # reason the bf16 ladder kept OOMing WITH remat_chunk. A
                # per-layer dynamic gather is one ~220 MB transient that
                # dies inside the (rematerialized) block.
                def body(c, li):
                    bp = jax.tree.map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, li, axis=0, keepdims=False), blocks_all)
                    # barrier: without it XLA hoists the backward's W^T
                    # layout transposes out of the loop and materializes
                    # whole-stack [L, d, d] copies (3 x 576 MB at 32L,
                    # measured) — trade a per-layer ~18 MB transient
                    # transpose for GiBs of resident copies
                    bp = jax.lax.optimization_barrier(bp)
                    return scan_body(c, (bp, li))

                return jax.lax.scan(body, carry, layer_ids[lo:lo + size])

            group_ckpt = jax.checkpoint(group_fn, static_argnums=(2, 3))
            carry = (h, enc_h)
            ys_groups = []
            for gi in range(g):
                lo = gi * remat_chunk
                carry, ys = group_ckpt(carry, params["blocks"], lo,
                                       min(remat_chunk, n_layers - lo))
                ys_groups.append(ys)
            h, enc_h = carry
            hs_list = None
            if ys_groups[0] is not None:
                hs_list = jax.tree.map(
                    lambda *parts: jnp.concatenate(parts, axis=0), *ys_groups)
        else:
            (h, enc_h), hs_list = jax.lax.scan(scan_body, (h, enc_h), xs)

        if seq_pad:
            h = h[:, :s_vid]

        # final norms (:613-620): 2B norms video only; 5B norms the joint sequence
        if not cfg.use_rotary_positional_embeddings:
            h = layer_norm(params["norm_final"], h, eps=norm_eps)
        else:
            joint = jnp.concatenate([enc_h, h], axis=1)
            joint = layer_norm(params["norm_final"], joint, eps=norm_eps)
            h = joint[:, text_len:]

        h = ada_layer_norm(params["norm_out"], h, emb, eps=norm_eps)
        h = linear(params["proj_out"], h)

        out = unpatchify(h, num_frames, height, width, cfg.patch_size)
        return TransformerOutput(sample=out,
                                 hidden_states_list=hs_list if return_hidden_states else None,
                                 resample_mask=resample_mask,
                                 calib_amax=hs_list if calibrate else None)
