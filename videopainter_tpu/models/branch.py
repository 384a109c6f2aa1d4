"""VideoPainter context encoder ("branch") — TPU-native.

Reimplements CogvideoXBranchModel (branch_cogvideox.py:43-435): a clone of the
first N backbone blocks with a widened patch embed
(noisy latent ‖ masked-video latent ‖ mask = in_channels*2+1 channels), per-layer
zero-initialized Linear projections of the block outputs, returning stacked
branch features scaled by `conditioning_scale`.

`init_from_transformer` mirrors from_transformer (:255-293): patch-embed conv
weights are duplicated into both latent channel slots, the mask slot zeroed,
and the first N blocks + time embedding copied.

TPU-first: the N (default 2) blocks scan over stacked params like the backbone;
the per-layer output projections are a single stacked einsum.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BranchConfig, TransformerConfig
from ..ops.basic import init_layer_norm, init_linear, linear
from ..ops.embeddings import init_timestep_mlp, timestep_embedding, timestep_mlp
from ..ops.norms import init_ada_layer_norm
from ..ops.patch_embed import init_patch_embed, patch_embed
from .dit import dit_block, init_dit_block


class CogVideoXBranch:
    def __init__(self, cfg: BranchConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32, pos_embedding=None) -> dict:
        cfg = self.cfg
        ks = jax.random.split(key, 6 + cfg.num_layers)
        params: Dict[str, Any] = {
            "patch_embed": init_patch_embed(
                ks[0], patch_size=cfg.patch_size, in_channels=cfg.patch_in_channels,
                embed_dim=cfg.inner_dim, text_embed_dim=cfg.text_embed_dim, dtype=dtype),
            "time_embedding": init_timestep_mlp(ks[1], cfg.inner_dim, cfg.time_embed_dim, dtype=dtype),
            # norm_final / norm_out / proj_out exist in the reference state dict
            # (branch_cogvideox.py:129-139) but are unused by forward; we keep
            # them for checkpoint round-trip fidelity.
            "norm_final": init_layer_norm(cfg.inner_dim, affine=cfg.norm_elementwise_affine, dtype=dtype),
            "norm_out": init_ada_layer_norm(ks[2], cfg.time_embed_dim, 2 * cfg.inner_dim,
                                            elementwise_affine=cfg.norm_elementwise_affine, dtype=dtype),
            "proj_out": init_linear(ks[3], cfg.inner_dim,
                                    cfg.patch_size * cfg.patch_size * cfg.out_channels, dtype=dtype),
            # zero-init per-layer projections (branch_cogvideox.py:142-147)
            "branch_blocks": {
                "kernel": jnp.zeros((cfg.num_layers, cfg.inner_dim, cfg.inner_dim), dtype=dtype),
                "bias": jnp.zeros((cfg.num_layers, cfg.inner_dim), dtype=dtype),
            },
            # zero-init, unused by forward (branch_cogvideox.py:147) — kept for parity
            "branch_x_embedder": {
                "kernel": jnp.zeros((cfg.in_channels, cfg.inner_dim), dtype=dtype),
                "bias": jnp.zeros((cfg.inner_dim,), dtype=dtype),
            },
        }
        blocks = [init_dit_block(ks[6 + i], cfg, dtype=dtype) for i in range(cfg.num_layers)]
        params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        if not cfg.use_rotary_positional_embeddings or cfg.use_learned_positional_embeddings:
            if pos_embedding is None:
                # eager path only; under jit pass the table as an argument
                # (see CogVideoXTransformer3D.host_pos_embedding)
                from .dit import CogVideoXTransformer3D
                pos_embedding = CogVideoXTransformer3D(cfg)._positional_embeddings(
                    cfg.sample_height, cfg.sample_width, cfg.sample_frames)
            params["patch_embed"]["pos_embedding"] = jnp.asarray(
                pos_embedding, dtype=dtype)
        return params

    def init_from_transformer(self, key, transformer_params: dict,
                              transformer_cfg: TransformerConfig, dtype=jnp.float32,
                              pos_embedding=None) -> dict:
        """Clone backbone weights into the branch (branch_cogvideox.py:255-293)."""
        cfg = self.cfg
        if pos_embedding is None:
            # the backbone's table is identical (same dims/config) — share it
            # so a jitted combined init embeds no host constant
            bb_pos = transformer_params.get("patch_embed", {}).get("pos_embedding")
            if bb_pos is not None:
                pos_embedding = bb_pos
        params = self.init(key, dtype=dtype, pos_embedding=pos_embedding)
        p = cfg.patch_size
        c_in = cfg.in_channels
        # backbone proj kernel: [(p*p*C_bb), D]; branch: [(p*p*C_branch), D]
        bb_kernel = transformer_params["patch_embed"]["proj"]["kernel"]
        d = bb_kernel.shape[-1]
        bb_k = bb_kernel.reshape(p, p, transformer_cfg.in_channels, d)
        new_k = jnp.zeros((p, p, cfg.patch_in_channels, d), dtype=bb_kernel.dtype)
        if cfg.patch_in_channels == 2 * c_in + 1:
            # T2V-style (ref c_in==16): both latent slots get the full kernel
            new_k = new_k.at[:, :, :c_in].set(bb_k)
            new_k = new_k.at[:, :, c_in:2 * c_in].set(bb_k)
        elif cfg.patch_in_channels == c_in + 1:
            # I2V-style (ref c_in==32, = 2*latent): noisy-latent half duplicated
            half = c_in // 2
            new_k = new_k.at[:, :, :half].set(bb_k[:, :, :half])
            new_k = new_k.at[:, :, half:c_in].set(bb_k[:, :, :half])
        else:
            raise ValueError(f"in_channels {c_in} not supported")
        # Every leaf taken from the backbone must be (a) CAST to the branch
        # dtype — the trainable branch may keep fp32 master weights while the
        # frozen backbone is bf16 — and (b) COPIED, never aliased: the branch
        # tree is donated into the train step (donate_argnums), and a shared
        # buffer with the frozen backbone would be donated out from under it
        # (`f(donate(a), a)` runtime error, caught by
        # test_trainer_loop_with_mesh). astype to a different dtype always
        # materializes; same-dtype astype can return the same buffer, so copy.
        def own(x):
            return x.astype(dtype) if x.dtype != dtype else x.copy()

        params["patch_embed"]["proj"]["kernel"] = own(
            new_k.reshape(p * p * cfg.patch_in_channels, d))
        params["patch_embed"]["proj"]["bias"] = own(
            transformer_params["patch_embed"]["proj"]["bias"])
        params["patch_embed"]["text_proj"] = jax.tree.map(
            own, transformer_params["patch_embed"]["text_proj"])
        params["time_embedding"] = jax.tree.map(
            own, transformer_params["time_embedding"])
        if "pos_embedding" in params["patch_embed"]:
            # init(pos_embedding=backbone_table) aliases when dtypes match
            params["patch_embed"]["pos_embedding"] = own(
                params["patch_embed"]["pos_embedding"])
        params["blocks"] = jax.tree.map(
            lambda x: own(x[: cfg.num_layers]),
            transformer_params["blocks"])
        return params

    def apply(
        self,
        params: dict,
        hidden_states: jnp.ndarray,          # [B, T, H, W, C_in] noisy latents
        encoder_hidden_states: Optional[jnp.ndarray],  # [B, S_text, text_dim]
        branch_cond: jnp.ndarray,            # [B, T, H, W, C_cond] (masked latents ‖ mask)
        timestep: jnp.ndarray,
        *,
        rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        conditioning_scale: float = 1.0,
        use_flash: bool = False,
        remat: bool = False,
        seq_axis: Optional[str] = None,
        ring_mesh=None,
        resident: Optional[bool] = None,  # None = auto: non-resident under
                                # the int8 attention modes (measured faster;
                                # models/dit.py). Numerics exact either way.
        calibrate: bool = False,  # also return [L, n_sites] activation amax
                                # from the dynamic int8 linears (see
                                # quantize.calibrate_ascales)
    ) -> jnp.ndarray:
        """Returns stacked branch features [num_layers, B, S_vid, D].

        Input concat along channels (branch_cogvideox.py:359): noisy ‖ cond.
        wo_text mode = cfg.wo_text (video-only blocks, :400-412).
        """
        cfg = self.cfg
        b = hidden_states.shape[0]
        if jnp.ndim(timestep) == 0:
            timestep = jnp.broadcast_to(timestep, (b,))

        t_emb = timestep_embedding(timestep, cfg.inner_dim,
                                   flip_sin_to_cos=cfg.flip_sin_to_cos,
                                   downscale_freq_shift=cfg.freq_shift)
        emb = timestep_mlp(params["time_embedding"], t_emb.astype(hidden_states.dtype))

        x = jnp.concatenate([hidden_states, branch_cond], axis=-1)
        if encoder_hidden_states is None:
            raise ValueError("encoder_hidden_states required (wo_text still embeds text)")
        from .dit import crop_pos_embedding
        pos = crop_pos_embedding(params["patch_embed"].get("pos_embedding"),
                                 cfg, encoder_hidden_states.shape[1],
                                 x.shape[1], x.shape[2], x.shape[3])
        embeds, _ = patch_embed(params["patch_embed"], encoder_hidden_states, x,
                                patch_size=cfg.patch_size, pos_embedding=pos)
        text_len = encoder_hidden_states.shape[1]
        enc_h = embeds[:, :text_len]
        h = embeds[:, text_len:]
        if seq_axis is not None:
            from jax.sharding import PartitionSpec as _P
            _sp = lambda x: jax.lax.with_sharding_constraint(
                x, _P(None, seq_axis, None))
        else:
            _sp = lambda x: x
        h = _sp(h)
        s_vid = h.shape[1]

        # Resident padded sequence (models/dit.py _SEQ_PAD_MULTIPLE): pad the
        # joint sequence once to the flash block multiple; exact for real
        # tokens (padded keys masked in-kernel via kv_valid_len).
        from .dit import _SEQ_PAD_MULTIPLE, _joint_identity_rope
        if resident is None:
            resident = use_flash not in ("int8", "int8pv")
        kv_valid_len = None
        seq_pad = 0
        if resident and use_flash and ring_mesh is None and seq_axis is None:
            eff_text = 0 if cfg.wo_text else text_len
            s_joint = eff_text + s_vid
            padded_len = -(-s_joint // _SEQ_PAD_MULTIPLE) * _SEQ_PAD_MULTIPLE
            seq_pad = padded_len - s_joint
            if seq_pad:
                kv_valid_len = s_joint
                h = jnp.pad(h, ((0, 0), (0, seq_pad), (0, 0)))
            if rope is not None:
                rope = _joint_identity_rope(rope, eff_text,
                                            eff_text + s_vid + seq_pad)

        num_heads = cfg.num_attention_heads
        wo_text = cfg.wo_text

        if calibrate and remat:
            raise ValueError("calibrate=True requires remat=False "
                             "(remat re-traces the block and double-fires "
                             "the calibration tap)")

        def scan_body(carry, bp):
            h, enc_h = carry

            ring_kw = dict(ring_axis=seq_axis if ring_mesh is not None else None,
                           ring_mesh=ring_mesh)

            def fn(bp, h, enc_h):
                if wo_text:
                    h2, _ = dit_block(bp, h, None, emb, rope,
                                      num_heads=num_heads, norm_eps=cfg.norm_eps,
                                      use_flash=use_flash,
                                      kv_valid_len=kv_valid_len)
                    return h2, enc_h
                return dit_block(bp, h, enc_h, emb, rope,
                                 num_heads=num_heads, norm_eps=cfg.norm_eps,
                                 use_flash=use_flash,
                                 kv_valid_len=kv_valid_len, **ring_kw)

            if remat:
                fn = jax.checkpoint(fn)
            if calibrate:
                from ..ops.basic import _set_calib_tap
                taps: list = []
                prev_tap = _set_calib_tap(taps)
                try:
                    h, enc_h = fn(bp, h, enc_h)
                finally:
                    _set_calib_tap(prev_tap)
                if not taps:
                    raise ValueError(
                        "calibrate=True but no dynamic int8 linear ran — "
                        "quantize the branch params first")
                h = _sp(h)
                return (h, enc_h), (h, jnp.stack(taps))
            h, enc_h = fn(bp, h, enc_h)
            h = _sp(h)
            return (h, enc_h), h

        (_, _), block_samples = jax.lax.scan(scan_body, (h, enc_h), params["blocks"])
        calib_amax = None
        if calibrate:
            block_samples, calib_amax = block_samples
        if seq_pad:
            block_samples = block_samples[:, :, :s_vid]

        # per-layer zero-init projections, one stacked einsum (branch_cogvideox.py:416-421)
        bb = params["branch_blocks"]
        projected = jnp.einsum("lbsd,lde->lbse", block_samples,
                               bb["kernel"].astype(block_samples.dtype),
                               preferred_element_type=jnp.float32).astype(block_samples.dtype)
        projected = projected + bb["bias"][:, None, None, :].astype(projected.dtype)
        out = projected * jnp.asarray(conditioning_scale, dtype=projected.dtype)
        if calibrate:
            return out, calib_amax
        return out
