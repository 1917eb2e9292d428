"""LPIPS weight conversion (tools/convert_lpips_weights.py) end-to-end:
fake torch VGG-16 + head state_dicts -> npz -> utils/lpips.LPIPS scoring."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")
import convert_lpips_weights as conv  # noqa: E402

from ucnerf_tpu.utils.lpips import LPIPS  # noqa: E402


def _fake_lpips_state_dict(rng):
    """lpips-package-style state_dict with VGG-16 shapes, random values."""
    sd = {}
    cin = 3
    idx = 0
    for stage, convs in conv.VGG_CFG:
        for j in range(1, convs + 1):
            cout = conv.VGG_OUT_CHANNELS[idx]
            sd[f"net.slice{stage}.{idx}.weight"] = torch.from_numpy(
                rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
            sd[f"net.slice{stage}.{idx}.bias"] = torch.from_numpy(
                rng.normal(0, 0.01, (cout,)).astype(np.float32))
            cin = cout
            idx += 1
    for k, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{k}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32))
    return sd


def test_extract_arrays_shapes(rng):
    sd = _fake_lpips_state_dict(rng)
    arrays = conv.extract_arrays([sd])
    assert arrays["vgg/conv1_1/kernel"].shape == (3, 3, 3, 64)
    assert arrays["vgg/conv5_3/kernel"].shape == (3, 3, 512, 512)
    assert arrays["vgg/conv3_2/bias"].shape == (256,)
    assert arrays["lin4/kernel"].shape == (1, 1, 512, 1)
    # HWIO transpose round-trips the torch OIHW values.
    np.testing.assert_array_equal(
        arrays["vgg/conv1_1/kernel"].transpose(3, 2, 0, 1),
        sd["net.slice1.0.weight"].numpy())


def test_extract_rejects_wrong_architecture(rng):
    sd = _fake_lpips_state_dict(rng)
    sd.pop("lin4.model.1.weight")
    with pytest.raises(ValueError, match="5 linear heads"):
        conv.extract_arrays([sd])


def test_converted_weights_score_images(tmp_path, rng):
    sd = _fake_lpips_state_dict(rng)
    arrays = conv.extract_arrays([sd])
    path = str(tmp_path / "lpips_vgg.npz")
    np.savez(path, **arrays)

    metric = LPIPS.from_file(path)
    assert metric is not None
    img0 = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.2, img0.shape), 0, 1).astype(
        np.float32)
    d_same = metric(img0, img0)
    d_diff = metric(img0, img1)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(d_diff) and d_diff > d_same


def test_cli_roundtrip(tmp_path, rng):
    sd = _fake_lpips_state_dict(rng)
    ckpt = str(tmp_path / "full.pth")
    torch.save(sd, ckpt)
    out = str(tmp_path / "out.npz")
    conv.main(["--ckpt", ckpt, "-o", out])
    data = np.load(out)
    assert len(data.files) == 13 * 2 + 5
