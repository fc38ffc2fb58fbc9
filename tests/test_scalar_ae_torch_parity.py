"""ScalarAE vs an independent torch implementation of the reference
architecture (weight-normed convs, PReLU, pre/post processors, straight-
through rounding — layout per `scalar24k.py:306-423`), exercised through the
checkpoint converter: torch state dict (reference names) -> convert ->
JAX decode must match the torch forward numerically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import scalar_ae
from uniaudio2_tpu.codec.scalar_ae import ScalarAEConfig
from uniaudio2_tpu.convert.codec import convert_scalar_ae

torch = pytest.importorskip("torch")
nn = torch.nn


def _wn(conv):
    return nn.utils.weight_norm(conv)


class ResUnit(nn.Module):
    def __init__(self, c, k, dilation):
        super().__init__()
        pad = (k * dilation - dilation) // 2
        self.conv1 = _wn(nn.Conv1d(c, c, k, dilation=dilation, padding=pad))
        self.conv2 = _wn(nn.Conv1d(c, c, 1))
        self.activation1 = nn.PReLU()
        self.activation2 = nn.PReLU()

    def forward(self, x):
        h = self.activation2(self.conv2(self.activation1(self.conv1(x))))
        return h + x


class Down(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.layer = _wn(nn.Conv1d(cin, cout, k, stride=stride,
                                   padding=(k - stride) // 2 if (k - stride) % 2 == 0 else 0))
        self.activation = nn.PReLU()

    def forward(self, x):
        return self.activation(self.layer(x))


class Up(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.layer = _wn(nn.ConvTranspose1d(cin, cout, k, stride=stride,
                                            padding=(k - stride) // 2))
        self.activation = nn.PReLU()

    def forward(self, x):
        return self.activation(self.layer(x))


class EncBlock(nn.Module):
    def __init__(self, cin, cout, k_down, stride, k_res):
        super().__init__()
        self.convs = nn.ModuleList(
            [ResUnit(cin, k_res, d) for d in (1, 3, 5, 7, 9)]
        )
        self.down_conv = Down(cin, cout, k_down, stride)

    def forward(self, x):
        for c in self.convs:
            x = c(x)
        return self.down_conv(x)


class DecBlock(nn.Module):
    def __init__(self, cin, cout, k_up, stride, k_res):
        super().__init__()
        self.up_conv = Up(cin, cout, k_up, stride)
        self.convs = nn.ModuleList(
            [ResUnit(cout, k_res, d) for d in (1, 3, 5, 7, 9)]
        )

    def forward(self, x):
        x = self.up_conv(x)
        for c in self.convs:
            x = c(x)
        return x


class TorchScalar(nn.Module):
    """num_samples=1 variant (no pre/post processors) of the reference
    ScalarModel layout; names match the checkpoint convention."""

    def __init__(self, cfg: ScalarAEConfig):
        super().__init__()
        ic = cfg.init_channel
        nd = len(cfg.downsample_factors)
        enc = [_wn(nn.Conv1d(cfg.num_bands, ic, cfg.default_kernel_size,
                             padding=cfg.default_kernel_size // 2))]
        for i, f in enumerate(cfg.downsample_factors):
            enc.append(EncBlock(ic * 2 ** i, ic * 2 ** (i + 1),
                                cfg.downsample_kernel_sizes[i], f,
                                cfg.res_kernel_size))
        enc.append(_wn(nn.Conv1d(ic * 2 ** nd, cfg.latent_hidden_dim,
                                 cfg.default_kernel_size,
                                 padding=cfg.default_kernel_size // 2)))
        dec = [_wn(nn.Conv1d(cfg.latent_hidden_dim, ic * 2 ** nd,
                             cfg.delay_kernel_size,
                             padding=cfg.delay_kernel_size // 2))]
        for i, f in enumerate(cfg.upsample_factors):
            cin = ic * 2 ** (nd - i)
            dec.append(DecBlock(cin, cin // 2, cfg.upsample_kernel_sizes[i],
                                f, cfg.res_kernel_size))
        dec.append(_wn(nn.Conv1d(ic, cfg.num_bands, cfg.default_kernel_size,
                                 padding=cfg.default_kernel_size // 2)))
        self.encoder = nn.ModuleList(enc)
        self.decoder = nn.ModuleList(dec)

    def decode(self, x):
        x = torch.round(9 * x) / 9
        for layer in self.decoder:
            x = layer(x)
        return x

    def encode(self, x):
        for i, layer in enumerate(self.encoder):
            x = layer(x) if i < len(self.encoder) - 1 else torch.tanh(layer(x))
        return x


def test_scalar_converter_and_decode_parity():
    cfg = ScalarAEConfig.tiny()   # num_samples=1
    torch.manual_seed(0)
    model = TorchScalar(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, missing = convert_scalar_ae(sd, cfg)
    assert not missing, missing[:5]
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, params,
        is_leaf=lambda x: x is None or isinstance(x, np.ndarray),
    )

    rng = np.random.default_rng(1)
    lat = (rng.standard_normal((1, 12, cfg.latent_hidden_dim)) * 0.4).astype(np.float32)
    with torch.no_grad():
        ref = model.decode(torch.from_numpy(lat.transpose(0, 2, 1))).numpy()
    ours = np.asarray(scalar_ae.decode(params, cfg, jnp.asarray(lat)))
    np.testing.assert_allclose(
        ours.transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-3
    )
    # encode side too
    wav = (rng.standard_normal((1, 48)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_lat = model.encode(torch.from_numpy(wav[:, None, :])).numpy()
    ours_lat = np.asarray(scalar_ae.encode(params, cfg, jnp.asarray(wav[..., None])))
    np.testing.assert_allclose(
        ours_lat.transpose(0, 2, 1), ref_lat, atol=1e-4, rtol=1e-3
    )
