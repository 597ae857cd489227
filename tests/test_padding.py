import numpy as np
import pytest

from paradis_tpu.sphere.padding import geocyclic_pad


def _np_field(B=2, H=8, W=12, C=3, seed=0):
    return np.random.default_rng(seed).normal(size=(B, H, W, C)).astype(np.float32)


def test_shapes():
    x = _np_field()
    for pad in (1, 2, 3):
        y = np.asarray(geocyclic_pad(x, pad))
        assert y.shape == (2, 8 + 2 * pad, 12 + 2 * pad, 3)


def test_pad_zero_identity():
    x = _np_field()
    y = np.asarray(geocyclic_pad(x, 0))
    np.testing.assert_array_equal(x, y)


def test_longitude_wrap():
    x = _np_field()
    pad = 2
    y = np.asarray(geocyclic_pad(x, pad))
    core = y[:, pad:-pad, :, :]
    np.testing.assert_allclose(core[:, :, :pad, :], core[:, :, -2 * pad : -pad, :])
    np.testing.assert_allclose(core[:, :, -pad:, :], core[:, :, pad : 2 * pad, :])


def test_pole_rows_are_rolled_mirrors():
    """Row above the pole must be the adjacent interior row rolled by 180°."""
    x = _np_field()
    pad = 2
    H, W = 8, 12
    y = np.asarray(geocyclic_pad(x, pad))
    # strip the longitude wrap to compare against the raw rows
    ycore = y[:, :, pad:-pad, :]
    # nearest ghost row to the top boundary mirrors interior row 1 rolled half
    np.testing.assert_allclose(ycore[:, pad - 1], np.roll(x[:, 1], W // 2, axis=1))
    # farthest ghost row mirrors interior row `pad`
    np.testing.assert_allclose(ycore[:, 0], np.roll(x[:, pad], W // 2, axis=1))
    # bottom side symmetric
    np.testing.assert_allclose(ycore[:, -pad], np.roll(x[:, -2], W // 2, axis=1))
    np.testing.assert_allclose(ycore[:, -1], np.roll(x[:, -(pad + 1)], W // 2, axis=1))


def test_odd_longitude_rejected():
    x = np.zeros((1, 4, 5, 1), np.float32)
    with pytest.raises(ValueError):
        geocyclic_pad(x, 1)


def test_torch_parity():
    """Bit-parity with the reference GeoCyclicPadding layout (torch CPU)."""
    torch = pytest.importorskip("torch")

    x = _np_field(B=1, H=6, W=10, C=4, seed=3)
    pad = 2
    ours = np.asarray(geocyclic_pad(x, pad))  # NHWC

    # independent NCHW re-implementation of the reference algorithm
    # (model/padding.py:24-39) using torch ops
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    mid = t.shape[3] // 2
    top = torch.roll(t[:, :, 1 : pad + 1, :], shifts=mid, dims=3)
    bot = torch.roll(t[:, :, -(pad + 1) : -1, :], shifts=mid, dims=3)
    t = torch.cat([top.flip(2), t, bot.flip(2)], dim=2)
    t = torch.cat([t[:, :, :, -pad:], t, t[:, :, :, :pad]], dim=3)
    theirs = t.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_array_equal(ours, theirs)
