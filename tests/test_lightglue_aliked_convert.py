"""Blob-drop readiness for aliked_lightglue.pth (VERDICT r1 #8).

The upstream checkpoint is missing (/root/reference/.MISSING_LARGE_BLOBS),
so this test proves the whole path works the day the blob lands: build the
reference torch LightGlue in its "aliked" configuration (input_dim 128 ->
input_proj present), randomize weights, save a .pth with the exact upstream
key schema, run it through weights/convert.py's real SPECS entry, load the
.npz, and check our lightglue_forward matches the torch forward.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


def test_aliked_lightglue_pth_convert_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "golden"))
    from make_golden import install_stubs
    install_stubs()
    sys.path.insert(0, REF)
    import torch
    from models.lightglue import LightGlue

    def randomize(model, seed):
        # 0.05 scale: random 9-layer transformers amplify float-order noise
        # chaotically; small weights keep the comparison about the
        # conversion, not about reassociation chaos
        g = torch.Generator().manual_seed(seed)
        sd = model.state_dict()
        for k, v in sd.items():
            if not torch.is_tensor(v) or not v.dtype.is_floating_point:
                continue
            if "confidence_thresholds" in k:
                continue  # derived buffer (lightglue.py:424-429)
            v.copy_(0.05 * torch.randn(v.shape, generator=g))
        model.load_state_dict(sd)
        return model

    orig_load = torch.load
    torch.load = lambda *a, **k: {}
    try:
        lg = LightGlue(features="aliked", weight_path="/nonexistent",
                       depth_confidence=-1, width_confidence=-1, flash=False)
    finally:
        torch.load = orig_load
    randomize(lg, 77)
    lg.eval()
    assert hasattr(lg, "input_proj"), "aliked config must project 128 -> 256"

    # save with the upstream key schema and convert via the real SPECS path
    src = tmp_path / "src" / "weights"
    src.mkdir(parents=True)
    torch.save(lg.state_dict(), src / "aliked_lightglue.pth")
    dst = tmp_path / "npz"
    from keypoint_bench_tpu.weights.convert import main as convert_main
    convert_main(str(tmp_path / "src"), str(dst))

    from keypoint_bench_tpu.weights import load_params
    params = load_params("lightglue_aliked", str(dst))
    assert "input_proj.weight" in params

    # parity: our functional forward vs the torch module on 128-d descs
    import jax.numpy as jnp
    from keypoint_bench_tpu.models.lightglue import lightglue_forward

    rg = np.random.default_rng(5)
    M, N = 48, 56
    kpts0 = rg.uniform(0, 511, (1, M, 2)).astype(np.float32)
    kpts1 = rg.uniform(0, 511, (1, N, 2)).astype(np.float32)
    de0 = rg.normal(0, 1, (1, M, 128)).astype(np.float32)
    de1 = rg.normal(0, 1, (1, N, 128)).astype(np.float32)
    with torch.no_grad():
        out = lg({"image0": {"keypoints": torch.from_numpy(kpts0),
                             "descriptors": torch.from_numpy(de0)},
                  "image1": {"keypoints": torch.from_numpy(kpts1),
                             "descriptors": torch.from_numpy(de1)}})
    m0_ref = out["matches0"].numpy()[0]
    ms_ref = out["matching_scores0"].numpy()[0]

    m0, ms, ok = lightglue_forward(
        params, jnp.asarray(kpts0[0]), jnp.ones(M, bool),
        jnp.asarray(de0[0]), jnp.asarray(kpts1[0]), jnp.ones(N, bool),
        jnp.asarray(de1[0]))
    np.testing.assert_allclose(np.asarray(ms), ms_ref, atol=2e-3)
    # with random weights, assignment scores hover at the 0.1 filter
    # threshold; require agreement except where the score is borderline
    # (float summation order legitimately flips those)
    decisive = np.abs(ms_ref - 0.1) > 1e-2
    np.testing.assert_array_equal(np.asarray(m0)[decisive], m0_ref[decisive])
