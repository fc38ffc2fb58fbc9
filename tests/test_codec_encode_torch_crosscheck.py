"""Independent torch cross-check of the codec encode fusion (VERDICT r2 item 2c).

From-scratch PyTorch implementation of `fetch_codes_batch`'s fusion chain
(`AudioDiffusion1D.py:515-551`): reason adaptor -> x2.5 nearest upsample,
stride-4/4/2/2 VALID downsample convs (`:244-251`), per-branch
condition-fusion linears (`:278-280`), `time_film` with gamma scale 0.1
(`:428-438`, deterministic — no dropout), and ResidualVQ nearest-neighbour
encode with input/output projections in codebook space. Identical code
*indices* on random weights is the acceptance bar (the discrete outputs —
any fusion-math divergence shows up as flipped nearest neighbours)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import encoder as jenc


def t_lin(p):
    w = torch.from_numpy(np.asarray(p["w"], np.float32))
    b = torch.from_numpy(np.asarray(p["b"], np.float32))
    return lambda x: x @ w + b


def t_dconv(x, p, stride):
    """nn.Conv1d(kernel=k, stride=k, padding=0) over (B, T, C)."""
    w = torch.from_numpy(np.asarray(p["w"], np.float32))  # (k, Cin, Cout)
    b = torch.from_numpy(np.asarray(p["b"], np.float32))
    wt = w.permute(2, 1, 0)                               # (Cout, Cin, k)
    return torch.nn.functional.conv1d(
        x.transpose(1, 2), wt, b, stride=stride).transpose(1, 2)


def t_film(x, cond, layer, gamma_scale=0.1):
    tl = min(x.shape[1], cond.shape[1])
    x, cond = x[:, :tl], cond[:, :tl]
    p = t_lin(layer)(cond)
    delta_gamma, beta = p.chunk(2, dim=-1)
    gamma = 1.0 + gamma_scale * torch.tanh(delta_gamma)
    return gamma * x + beta


def t_rvq_encode_indices(params, x):
    """ResidualVQ encode: shared input projection, per-quantizer euclidean
    nearest neighbour, residual subtraction in projected space."""
    inw = torch.from_numpy(np.asarray(params["project_in_w"], np.float32))
    inb = torch.from_numpy(np.asarray(params["project_in_b"], np.float32))
    books = torch.from_numpy(np.asarray(params["codebooks"], np.float32))
    z = x @ inw + inb
    idxs = []
    residual = z
    for q in range(books.shape[0]):
        cb = books[q]
        d2 = (residual.unsqueeze(-2) - cb[None, None]).pow(2).sum(-1)
        idx = d2.argmin(-1)
        idxs.append(idx)
        residual = residual - cb[idx]
    return torch.stack(idxs, dim=-1)


def t_interp_nearest(x, scale):
    return torch.nn.functional.interpolate(
        x.permute(0, 2, 1), scale_factor=scale, mode="nearest"
    ).permute(0, 2, 1)


def torch_fuse_and_quantize(params, whisper_f, wavlm_f, bestrq_ac,
                            bestrq_sem, reason_q):
    rf = t_lin(params["reason_adaptor"])(reason_q)
    rf = t_interp_nearest(rf, 2.5)

    whisper_ds = t_dconv(whisper_f, params["d_conv_whisper"], 4)
    wavlm_ds = t_dconv(wavlm_f, params["d_conv_wavlm"], 4)
    sem_ds = t_dconv(bestrq_sem, params["d_conv_semantic"], 2)
    ac_ds = t_dconv(bestrq_ac, params["d_conv_acoustic"], 2)

    phone = t_film(t_lin(params["fusion_phone"])(wavlm_ds), rf,
                   params["film_phone"])
    codes_phone = t_rvq_encode_indices(params["rvq_phone"], phone)

    sem = t_film(t_lin(params["fusion_semantic"])(sem_ds), rf,
                 params["film_semantic"])
    codes_sem = t_rvq_encode_indices(params["rvq_semantic"], sem)

    tl = min(ac_ds.shape[1], whisper_ds.shape[1])
    ac = torch.cat([ac_ds[:, :tl], whisper_ds[:, :tl]], -1)
    ac = t_film(t_lin(params["fusion_acoustic"])(ac), rf,
                params["film_acoustic"])
    codes_ac = t_rvq_encode_indices(params["rvq_acoustic"], ac)

    tmin = min(codes_phone.shape[1], codes_sem.shape[1], codes_ac.shape[1])
    return torch.cat([codes_phone[:, :tmin], codes_sem[:, :tmin],
                      codes_ac[:, :tmin]], -1)


def test_encode_fusion_matches_independent_torch():
    cfg = jenc.EncoderConfig.tiny_test()
    params = jenc.init_encode_params(jax.random.PRNGKey(0), cfg)

    b, t25 = 2, 20
    t50, t5 = 2 * t25, t25 // 5
    rng = np.random.default_rng(1)
    whisper_f = rng.normal(size=(b, t50, cfg.whisper.d_model)).astype(np.float32)
    wavlm_f = rng.normal(size=(b, t50, cfg.wavlm_dim)).astype(np.float32)
    bestrq_ac = rng.normal(size=(b, t25, cfg.bestrq_dim)).astype(np.float32)
    bestrq_sem = rng.normal(size=(b, t25, cfg.bestrq_dim)).astype(np.float32)
    reason_q = rng.normal(size=(b, t5, cfg.codec_dim)).astype(np.float32)

    got = np.asarray(jenc.fuse_and_quantize(
        params, jnp.asarray(whisper_f), jnp.asarray(wavlm_f),
        jnp.asarray(bestrq_ac), jnp.asarray(bestrq_sem),
        jnp.asarray(reason_q)))

    with torch.no_grad():
        exp = torch_fuse_and_quantize(
            params, torch.from_numpy(whisper_f), torch.from_numpy(wavlm_f),
            torch.from_numpy(bestrq_ac), torch.from_numpy(bestrq_sem),
            torch.from_numpy(reason_q)).numpy()

    assert got.shape == exp.shape == (b, t25 // 2, 8)
    np.testing.assert_array_equal(got, exp)


def test_encode_window_uses_fusion_chain():
    """encode_window still routes through fuse_and_quantize after the
    refactor (shape/determinism smoke on the full wav->codes path)."""
    from uniaudio2_tpu.codec.decoder import CodecConfig

    cfg = jenc.EncoderConfig.tiny_test()
    ccfg = CodecConfig.tiny()
    params = jenc.init_encode_params(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, ccfg.sample_rate))
    r1, s1 = jenc.encode_window(params, cfg, ccfg, wav)
    r2, s2 = jenc.encode_window(params, cfg, ccfg, wav)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert r1.shape[-1] == 8 and s1.shape[-1] == 8
