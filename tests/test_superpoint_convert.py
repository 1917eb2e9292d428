"""SuperPoint weight conversion (tools/convert_superpoint_weights.py):
fake torch state_dict -> npz -> flax SuperPointNet, with a functional torch
forward as the parity oracle (mirrors the LPIPS converter test pattern)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")
import convert_superpoint_weights as conv  # noqa: E402

from ucnerf_tpu.pose import features  # noqa: E402


def _fake_superpoint_state_dict(rng, prefix=""):
    sd = {}
    for name, hw, cin, cout in conv.SUPERPOINT_LAYERS:
        sd[f"{prefix}{name}.weight"] = torch.from_numpy(
            rng.normal(0, 0.1, (cout, cin, hw, hw)).astype(np.float32))
        sd[f"{prefix}{name}.bias"] = torch.from_numpy(
            rng.normal(0, 0.05, (cout,)).astype(np.float32))
    return sd


def _torch_forward(sd, img_nchw, prefix=""):
    """Functional replica of the reference forward (superpoint.py:104-146)."""
    import torch.nn.functional as F

    def c(x, name, pad):
        return F.conv2d(x, sd[f"{prefix}{name}.weight"],
                        sd[f"{prefix}{name}.bias"], padding=pad)

    x = img_nchw
    for block in ("1", "2", "3"):
        x = F.relu(c(x, f"conv{block}a", 1))
        x = F.relu(c(x, f"conv{block}b", 1))
        x = F.max_pool2d(x, 2, 2)
    x = F.relu(c(x, "conv4a", 1))
    x = F.relu(c(x, "conv4b", 1))
    semi = c(F.relu(c(x, "convPa", 1)), "convPb", 0)
    desc = c(F.relu(c(x, "convDa", 1)), "convDb", 0)
    desc = desc / desc.norm(p=2, dim=1, keepdim=True).clamp(min=1e-8)
    return semi, desc


def test_extract_arrays_shapes(rng):
    sd = _fake_superpoint_state_dict(rng)
    arrays = conv.extract_arrays(sd)
    assert arrays["conv1a/kernel"].shape == (3, 3, 1, 64)
    assert arrays["convPb/kernel"].shape == (1, 1, 256, 65)
    assert arrays["convDb/kernel"].shape == (1, 1, 256, 256)
    assert arrays["conv3a/bias"].shape == (128,)
    np.testing.assert_array_equal(
        arrays["conv4b/kernel"].transpose(3, 2, 0, 1),
        sd["conv4b.weight"].numpy())


def test_extract_handles_module_prefix(rng):
    sd = _fake_superpoint_state_dict(rng, prefix="net.")
    arrays = conv.extract_arrays(sd)
    assert len(arrays) == 24


def test_extract_rejects_wrong_architecture(rng):
    sd = _fake_superpoint_state_dict(rng)
    sd["conv2b.weight"] = torch.zeros((65, 64, 3, 3))
    with pytest.raises(ValueError, match="conv2b.weight"):
        conv.extract_arrays(sd)


def test_converted_net_matches_torch_forward(tmp_path, rng):
    """Converted flax net reproduces the torch forward bit-for-bit-ish."""
    sd = _fake_superpoint_state_dict(rng)
    arrays = conv.extract_arrays(sd)
    path = str(tmp_path / "superpoint.npz")
    np.savez(path, **arrays)
    variables = features.load_superpoint_params(path)

    img = rng.uniform(0, 1, (1, 48, 64, 1)).astype(np.float32)
    semi_flax, desc_flax = features.SuperPointNet().apply(variables, img)

    semi_t, desc_t = _torch_forward(
        sd, torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(semi_flax),
                               semi_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(desc_flax),
                               desc_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)


def test_detect_and_describe_runs(tmp_path, rng):
    sd = _fake_superpoint_state_dict(rng)
    path = str(tmp_path / "superpoint.npz")
    np.savez(path, **conv.extract_arrays(sd))
    variables = features.load_superpoint_params(path)
    gray = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    kps, descs = features.superpoint_detect_and_describe(
        variables, gray, max_keypoints=64, keypoint_threshold=0.0)
    assert kps.shape[0] == descs.shape[0] <= 64
    assert descs.shape[1] == 256
    if len(kps):
        assert kps[:, 0].max() < 64 and kps[:, 1].max() < 48
        np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0,
                                   atol=1e-5)


def test_simple_nms_matches_torch(rng):
    """Our jax simple_nms replicates the reference's (superpoint.py:5-21)."""
    import torch.nn.functional as F

    scores_np = rng.uniform(0, 1, (1, 40, 56)).astype(np.float32)

    def torch_nms(scores, radius):
        def max_pool(x):
            return F.max_pool2d(x, kernel_size=radius * 2 + 1, stride=1,
                                padding=radius)
        zeros = torch.zeros_like(scores)
        max_mask = scores == max_pool(scores)
        for _ in range(2):
            supp_mask = max_pool(max_mask.float()) > 0
            supp_scores = torch.where(supp_mask, zeros, scores)
            new_max = supp_scores == max_pool(supp_scores)
            max_mask = max_mask | (new_max & (~supp_mask))
        return torch.where(max_mask, scores, zeros)

    ours = np.asarray(features.simple_nms(scores_np, 4))
    theirs = torch_nms(torch.from_numpy(scores_np)[None], 4)[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_cli_roundtrip(tmp_path, rng):
    sd = _fake_superpoint_state_dict(rng)
    ckpt = str(tmp_path / "superpoint_v1.pth")
    torch.save(sd, ckpt)
    out = str(tmp_path / "out.npz")
    conv.main(["--ckpt", ckpt, "-o", out])
    assert len(np.load(out).files) == 24
