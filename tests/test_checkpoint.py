"""Checkpoint converter tests.

Builds a synthetic reference-style state dict (torch key names / torch weight
shapes per reference `bicodec.py` module tree) for the tiny config and checks
`convert_bicodec` produces a pytree identical in structure and shapes to
`init_bicodec`.  Plus a numeric test for the speaker-project permutation.
"""

import jax
import numpy as np

from sparktts_tpu import checkpoint as CKPT
from sparktts_tpu.codec.bicodec import init_bicodec
from sparktts_tpu.config import tiny_test_config

rng = np.random.default_rng(0)


def _lin(d, pre, i, o):
    d[f"{pre}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
    d[f"{pre}.bias"] = rng.standard_normal(o).astype(np.float32)


def _lin_nobias(d, pre, i, o):
    d[f"{pre}.weight"] = rng.standard_normal((o, i)).astype(np.float32)


def _conv(d, pre, ci, co, k, groups=1):
    d[f"{pre}.weight"] = rng.standard_normal((co, ci // groups, k)).astype(np.float32)
    d[f"{pre}.bias"] = rng.standard_normal(co).astype(np.float32)


def _wnconv(d, pre, ci, co, k):
    d[f"{pre}.weight_g"] = rng.standard_normal((co, 1, 1)).astype(np.float32)
    d[f"{pre}.weight_v"] = rng.standard_normal((co, ci, k)).astype(np.float32)
    d[f"{pre}.bias"] = rng.standard_normal(co).astype(np.float32)


def _wnconvT(d, pre, ci, co, k):
    d[f"{pre}.weight_g"] = rng.standard_normal((ci, 1, 1)).astype(np.float32)
    d[f"{pre}.weight_v"] = rng.standard_normal((ci, co, k)).astype(np.float32)
    d[f"{pre}.bias"] = rng.standard_normal(co).astype(np.float32)


def _convT(d, pre, ci, co, k, groups=1):
    d[f"{pre}.weight"] = rng.standard_normal((ci, co // groups, k)).astype(np.float32)
    d[f"{pre}.bias"] = rng.standard_normal(co).astype(np.float32)


def _ln(d, pre, c):
    d[f"{pre}.weight"] = rng.standard_normal(c).astype(np.float32)
    d[f"{pre}.bias"] = rng.standard_normal(c).astype(np.float32)


def _bn(d, pre, c):
    _ln(d, pre, c)
    d[f"{pre}.running_mean"] = rng.standard_normal(c).astype(np.float32)
    d[f"{pre}.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)


def _snake(d, key, c):
    d[key] = rng.standard_normal((1, c, 1)).astype(np.float32)


def _vocos(d, pre, cin, dim, inter, layers, cond=None):
    _conv(d, f"{pre}.embed", cin, dim, 7)
    if cond:
        _lin(d, f"{pre}.norm.scale", cond, dim)
        _lin(d, f"{pre}.norm.shift", cond, dim)
    else:
        _ln(d, f"{pre}.norm", dim)
    for i in range(layers):
        b = f"{pre}.convnext.{i}"
        _conv(d, f"{b}.dwconv", dim, dim, 7, groups=dim)
        if cond:
            _lin(d, f"{b}.norm.scale", cond, dim)
            _lin(d, f"{b}.norm.shift", cond, dim)
        else:
            _ln(d, f"{b}.norm", dim)
        _lin(d, f"{b}.pwconv1", dim, inter)
        _lin(d, f"{b}.pwconv2", inter, dim)
        d[f"{b}.gamma"] = rng.standard_normal(dim).astype(np.float32)
    _ln(d, f"{pre}.final_layer_norm", dim)


def build_reference_state(cfg) -> dict:
    d = {}
    e = cfg.encoder
    # encoder
    _vocos(d, "encoder.encoder", e.input_channels, e.vocos_dim, e.vocos_intermediate_dim, e.vocos_num_layers)
    for j, r in enumerate(e.sample_ratios):
        if r > 1:
            _conv(d, f"encoder.downsample.{j}.0.conv_downsampler.1", e.vocos_dim, e.vocos_dim, 2 * r, groups=e.vocos_dim)
        _vocos(d, f"encoder.downsample.{j}.1", e.vocos_dim, e.vocos_dim, e.vocos_intermediate_dim, 2)
    _lin(d, "encoder.project", e.vocos_dim, e.out_channels)
    # quantizer (FVQ)
    q = cfg.quantizer
    d["quantizer.codebook.weight"] = rng.standard_normal((q.codebook_size, q.codebook_dim)).astype(np.float32)
    _wnconv(d, "quantizer.in_project", q.input_dim, q.codebook_dim, 1)
    _wnconv(d, "quantizer.out_project", q.codebook_dim, q.input_dim, 1)
    # speaker encoder
    s = cfg.speaker_encoder
    C = s.ecapa_channels
    lat = s.perceiver_dim_context
    pre = "speaker_encoder.speaker_encoder"
    _conv(d, f"{pre}.layer1.conv", s.input_dim, C, 5)
    _bn(d, f"{pre}.layer1.bn", C)
    for li in (2, 3, 4):
        b = f"{pre}.layer{li}.se_res2block"
        _conv(d, f"{b}.0.conv", C, C, 1)
        _bn(d, f"{b}.0.bn", C)
        w = C // 8
        for i in range(7):
            _conv(d, f"{b}.1.convs.{i}", w, w, 3)
            _bn(d, f"{b}.1.bns.{i}", w)
        _conv(d, f"{b}.2.conv", C, C, 1)
        _bn(d, f"{b}.2.bn", C)
        _lin(d, f"{b}.3.linear1", C, 128)
        _lin(d, f"{b}.3.linear2", 128, C)
    _conv(d, f"{pre}.conv", 3 * C, lat, 1)
    _conv(d, f"{pre}.pool.linear1", lat * 3, 128, 1)
    _conv(d, f"{pre}.pool.linear2", 128, lat, 1)
    _bn(d, f"{pre}.bn", 2 * lat)
    _lin(d, f"{pre}.linear", 2 * lat, s.out_dim)
    # perceiver
    pp = "speaker_encoder.perceiver_sampler"
    d[f"{pp}.latents"] = rng.standard_normal((s.token_num, s.latent_dim)).astype(np.float32)
    _lin(d, f"{pp}.proj_context", lat, s.latent_dim)
    inner = s.perceiver_dim_head * s.perceiver_heads
    ff_inner = int(s.latent_dim * s.perceiver_ff_mult * 2 / 3)
    for i in range(s.perceiver_depth):
        _lin_nobias(d, f"{pp}.layers.{i}.0.to_q", s.latent_dim, inner)
        _lin_nobias(d, f"{pp}.layers.{i}.0.to_kv", s.latent_dim, inner * 2)
        _lin_nobias(d, f"{pp}.layers.{i}.0.to_out", inner, s.latent_dim)
        _lin(d, f"{pp}.layers.{i}.1.0", s.latent_dim, ff_inner * 2)
        _lin(d, f"{pp}.layers.{i}.1.2", ff_inner, s.latent_dim)
    d[f"{pp}.norm.gamma"] = rng.standard_normal(s.latent_dim).astype(np.float32)
    # residual FSQ projections
    _lin(d, "speaker_encoder.quantizer.project_in", s.latent_dim, len(s.fsq_levels))
    _lin(d, "speaker_encoder.quantizer.project_out", len(s.fsq_levels), s.latent_dim)
    _lin(d, "speaker_encoder.project", s.latent_dim * s.token_num, s.out_dim)
    # prenet / postnet
    for name, dc in (("prenet", cfg.prenet), ("postnet", cfg.postnet)):
        _lin(d, f"{name}.linear_pre", dc.input_channels, dc.vocos_dim)
        for j, r in enumerate(dc.sample_ratios):
            if r > 1:
                _convT(d, f"{name}.downsample.{j}.0.de_conv_upsampler.1", dc.vocos_dim, dc.vocos_dim, 2 * r, groups=dc.vocos_dim)
            _vocos(d, f"{name}.downsample.{j}.1", dc.vocos_dim, dc.vocos_dim, dc.vocos_intermediate_dim, 2)
        _vocos(d, f"{name}.vocos_backbone", dc.vocos_dim, dc.vocos_dim, dc.vocos_intermediate_dim, dc.vocos_num_layers, cond=dc.condition_dim)
        _lin(d, f"{name}.linear", dc.vocos_dim, dc.out_channels)
    # wave generator
    w = cfg.decoder
    _wnconv(d, "decoder.model.0", w.input_channel, w.channels, 7)
    for i, (k, r) in enumerate(zip(w.kernel_sizes, w.rates)):
        ci, co = w.channels // 2**i, w.channels // 2 ** (i + 1)
        b = f"decoder.model.{1 + i}.block"
        _snake(d, f"{b}.0.alpha", ci)
        _wnconvT(d, f"{b}.1", ci, co, k)
        for ru in range(3):
            _snake(d, f"{b}.{2 + ru}.block.0.alpha", co)
            _wnconv(d, f"{b}.{2 + ru}.block.1", co, co, 7)
            _snake(d, f"{b}.{2 + ru}.block.2.alpha", co)
            _wnconv(d, f"{b}.{2 + ru}.block.3", co, co, 1)
    last = w.channels // 2 ** len(w.rates)
    _snake(d, f"decoder.model.{len(w.rates) + 1}.alpha", last)
    _wnconv(d, f"decoder.model.{len(w.rates) + 2}", last, w.d_out, 7)
    return d


def test_convert_bicodec_structure_matches_init():
    cfg = tiny_test_config().bicodec
    state = build_reference_state(cfg)
    converted = CKPT.convert_bicodec(state, cfg)
    reference = init_bicodec(jax.random.PRNGKey(0), cfg)

    conv_paths = {jax.tree_util.keystr(kp): v.shape for kp, v in jax.tree_util.tree_leaves_with_path(converted)}
    init_paths = {jax.tree_util.keystr(kp): v.shape for kp, v in jax.tree_util.tree_leaves_with_path(reference)}
    missing = set(init_paths) - set(conv_paths)
    extra = set(conv_paths) - set(init_paths)
    assert not missing, f"converter missing params: {sorted(missing)[:10]}"
    assert not extra, f"converter extra params: {sorted(extra)[:10]}"
    mismatched = {k for k in init_paths if tuple(conv_paths[k]) != tuple(init_paths[k])}
    assert not mismatched, {k: (conv_paths[k], init_paths[k]) for k in sorted(mismatched)[:10]}


def test_converted_bicodec_runs():
    import jax.numpy as jnp

    from sparktts_tpu.codec.bicodec import bicodec_detokenize, bicodec_tokenize

    cfg = tiny_test_config().bicodec
    params = jax.tree.map(jnp.asarray, CKPT.convert_bicodec(build_reference_state(cfg), cfg))
    feat = jnp.asarray(rng.standard_normal((1, 48, cfg.encoder.input_channels)), jnp.float32)
    ref_wav = jnp.asarray(0.1 * rng.standard_normal((1, 48 * 320)), jnp.float32)
    sem, glob = bicodec_tokenize(params, cfg, feat, ref_wav)
    wav = bicodec_detokenize(params, cfg, sem, glob)
    assert np.isfinite(np.asarray(wav)).all()


def test_speaker_project_permutation():
    """Permuted weight on (token, latent) flatten == torch weight on
    (latent, token) flatten."""
    D, N, O = 4, 3, 5
    w_torch = rng.standard_normal((O, D * N)).astype(np.float32)
    state = {"p.weight": w_torch}
    p = CKPT._speaker_project_permuted(state, "p", D, N)
    zq = rng.standard_normal((2, N, D)).astype(np.float32)  # ours: (B, N, D)
    ours = zq.reshape(2, -1) @ p["w"]
    # torch: zq channel-first (B, D, N) flattened
    theirs = zq.transpose(0, 2, 1).reshape(2, -1) @ w_torch.T
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_param_cache_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {
        "a": jnp.ones((4, 4), jnp.bfloat16),
        "layers": [{"w": jnp.zeros((2, 3))}, {"w": jnp.ones((2, 3))}],
    }
    CKPT.save_param_cache(tmp_path / "cache", tree)
    restored = CKPT.load_param_cache(tmp_path / "cache")
    assert restored is not None
    flat1 = jax.tree.leaves(tree)
    flat2 = jax.tree.leaves(restored)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.shape == b.shape and a.dtype == b.dtype
    assert CKPT.load_param_cache(tmp_path / "missing") is None
