"""Tensor-parallel inference: sharded pipeline matches single-device output."""

import jax
import jax.numpy as jnp
import numpy as np

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.parallel import make_mesh
from videopainter_tpu.parallel.inference import (inference_param_specs,
                                                 shard_inference_params)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintPipeline
from videopainter_tpu.schedulers import CogVideoXDPMScheduler


def test_tp_sharded_pipeline_matches():
    # heads=4 divisible by model axis 2
    cfg = TransformerConfig.tiny(num_attention_heads=4, attention_head_dim=16,
                                 in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    vcfg = VAEConfig.tiny(latent_channels=16)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(vcfg)
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    image = video[:, 0] * (1 - jnp.asarray(masks[:, 0, :, :, None]))
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    call_kw = dict(image=image, video=video, masks=jnp.asarray(masks),
                   prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
                   num_inference_steps=2, guidance_scale=6.0,
                   replace_gt=True, mask_add=True, vae_sample_mode="mode",
                   rng=jax.random.PRNGKey(7), output_type="latent")

    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    ref = np.asarray(pipe(params, **call_kw))

    mesh = make_mesh(data=2, seq=2, model=2)
    specs = inference_param_specs(params)
    # attention kernels actually annotated with the model axis
    assert "model" in str(specs["transformer"]["blocks"]["attn1"]["to_q"]["kernel"])
    sharded = shard_inference_params(params, mesh)
    pipe2 = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    with mesh:
        out = np.asarray(pipe2(sharded, **call_kw))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_sequence_parallel_constraint():
    """seq_axis GSPMD sequence parallelism: the compiled program must contain
    collectives (KV all-gathers) and match the replicated output."""
    import numpy as np
    from jax.sharding import Mesh

    from videopainter_tpu.config import TransformerConfig
    from videopainter_tpu.models import CogVideoXTransformer3D

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4, 1),
                ("data", "seq", "model"))
    cfg = TransformerConfig.tiny(num_layers=2)
    m = CogVideoXTransformer3D(cfg)
    params = m.init(jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, cfg.in_channels))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 3, cfg.text_embed_dim))
    t = jnp.array([500])

    with mesh:
        f = jax.jit(lambda p, h, x, tt: m.apply(p, h, x, tt, seq_axis="seq").sample)
        hlo = f.lower(params, hidden, text, t).compile().as_text()
        n_coll = sum(hlo.count(op) for op in
                     ("all-gather", "reduce-scatter", "all-reduce"))
        assert n_coll > 0, "seq_axis constraint compiled to no collectives"
        out_sp = f(params, hidden, text, t)
    out0 = jax.jit(lambda p, h, x, tt: m.apply(p, h, x, tt).sample)(
        params, hidden, text, t)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_tp_sp_matches_single_device():
    """Full dual-stream inpaint pipeline under a (data=1, seq=4, model=2) mesh
    with TP-sharded params + seq_axis sequence parallelism must match the
    single-device run."""
    import numpy as np
    from jax.sharding import Mesh

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.parallel.inference import shard_inference_params
    from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintPipeline
    from videopainter_tpu.schedulers import CogVideoXDDIMScheduler

    cfg = TransformerConfig.tiny(num_attention_heads=4, attention_head_dim=16,
                                 in_channels=32, out_channels=16, num_layers=2,
                                 sample_height=8, sample_width=12,
                                 text_embed_dim=16)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    vcfg = VAEConfig.tiny(latent_channels=16)
    transformer, branch = CogVideoXTransformer3D(cfg), CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(vcfg)
    sched = CogVideoXDDIMScheduler(SchedulerConfig(
        prediction_type="v_prediction", timestep_spacing="trailing"))
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(2))}
    params["branch"] = branch.init_from_transformer(
        jax.random.PRNGKey(1), params["transformer"], cfg)
    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3) * 2 - 1, jnp.float32)
    masks = jnp.asarray((rng.rand(1, 9, 64, 96) > 0.5).astype(np.float32))
    embeds = jnp.asarray(rng.rand(1, 5, 16), jnp.float32)
    kw = dict(video=video, masks=masks, image=video[:, 0],
              prompt_embeds=embeds,
              negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=2, guidance_scale=6.0, replace_gt=True,
              mask_add=True, rng=jax.random.PRNGKey(7),
              vae_sample_mode="mode")

    ref = pipe(params, **kw)
    mesh = Mesh(np.array(jax.devices()).reshape(1, 4, 2),
                ("data", "seq", "model"))
    with mesh:
        sp = shard_inference_params(params, mesh)
        out = pipe(sp, **kw, seq_axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)


def test_transformer_ring_attention_matches():
    """Full DiT with shard_map ring attention (ring_mesh + seq_axis) must
    match the dense single-device forward."""
    import numpy as np
    from jax.sharding import Mesh

    from videopainter_tpu.config import TransformerConfig
    from videopainter_tpu.models import CogVideoXTransformer3D

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4, 1),
                ("data", "seq", "model"))
    cfg = TransformerConfig.tiny(num_layers=2)
    m = CogVideoXTransformer3D(cfg)
    params = m.init(jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 16, cfg.in_channels))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 3, cfg.text_embed_dim))
    t = jnp.array([500])

    ref = m.apply(params, hidden, text, t).sample
    with mesh:
        out = jax.jit(lambda p, h, x, tt: m.apply(
            p, h, x, tt, seq_axis="seq", ring_mesh=mesh).sample)(
            params, hidden, text, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_mesh_fallback_and_distributed_noop():
    """make_hybrid_mesh: on a single-slice backend (CPU devices carry no
    slice_index) the DCN factor folds into `data`; initialize_distributed is
    a no-op without a coordinator and reports process 0."""
    from videopainter_tpu.parallel import initialize_distributed, make_hybrid_mesh

    mesh = make_hybrid_mesh(dcn_data=2, data=2, seq=2, model=1)
    assert mesh.axis_names == ("data", "seq", "model")
    assert mesh.devices.shape == (4, 2, 1)

    try:
        make_hybrid_mesh(dcn_data=3, data=1, seq=1, model=1)
    except ValueError as e:
        assert "devices" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for non-divisible mesh")

    assert initialize_distributed() == 0
