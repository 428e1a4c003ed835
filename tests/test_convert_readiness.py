"""Blob-drop readiness for every checkpoint in .MISSING_LARGE_BLOBS
(round-3 verdict item 9).

The upstream weight files for 5 models (superpoint_v1.pth, xfeat.pt,
disk.pth, sfd2.pth, d2_tf.pth) and 2 more LightGlue variants
(superpoint_lightglue.pth, disk_lightglue.pth) are missing from the
reference checkout, so day-one conversion has never been exercised. These
tests remove the assumption: build the reference torch module, randomize,
save a .pth with the EXACT upstream filename + nesting schema
(reference models/model_interface.py:45-83: disk.pth wraps under
'extractor', sfd2.pth under 'model' with strict=False, d2_tf.pth under
'model' per models/D2_Net.py:93-97, the rest plain state_dicts), run it
through weights/convert.py's real SPECS path, and check (a) the .npz
tensors equal the direct state_dict conversion and (b) our JAX forward
consumes the converted params. The aliked LightGlue variant has the same
round-trip plus full forward parity in test_lightglue_aliked_convert.py;
here the superpoint/disk variants get the forward-parity treatment too.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


def _setup_ref():
    sys.path.insert(0, GOLDEN_DIR)
    from make_golden import install_stubs, randomize
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return randomize


def _build(model_name, randomize):
    if model_name == "SuperPoint":
        from models.SuperPoint import SuperPointNet
        return randomize(SuperPointNet(), 10)
    if model_name == "XFeat":
        from models.XFeat import XFeatModel
        return randomize(XFeatModel(), 11)
    if model_name == "DISK":
        from models.disk import DISK
        return randomize(DISK(), 12)
    if model_name == "sfd2":
        from models.sfd2 import ResSegNetV2
        return randomize(ResSegNetV2(outdim=128, require_stability=True), 13)
    if model_name == "D2Net":
        from models.D2_Net import D2Net
        return randomize(D2Net(model_file=None, use_cuda=False), 14)
    raise AssertionError(model_name)


# (our model/spec name, upstream filename, checkpoint nesting)
MODEL_SCHEMAS = [
    ("SuperPoint", "superpoint_v1.pth", lambda sd: sd),
    ("XFeat", "xfeat.pt", lambda sd: sd),
    ("DISK", "disk.pth", lambda sd: {"extractor": sd}),
    ("sfd2", "sfd2.pth", lambda sd: {"model": sd}),
    ("D2Net", "d2_tf.pth", lambda sd: {"model": sd}),
]


@pytest.mark.parametrize("name,fname,wrap", MODEL_SCHEMAS,
                         ids=[m[0] for m in MODEL_SCHEMAS])
def test_missing_blob_schema_convert_roundtrip(tmp_path, name, fname, wrap):
    randomize = _setup_ref()
    import torch
    from keypoint_bench_tpu.weights.convert import (convert_state_dict,
                                                    main as convert_main)

    model = _build(name, randomize).eval()
    sd = model.state_dict()

    src = tmp_path / "src" / "weights"
    src.mkdir(parents=True)
    torch.save(wrap(sd), src / fname)
    dst = tmp_path / "npz"
    convert_main(str(tmp_path / "src"), str(dst))

    from keypoint_bench_tpu.weights import load_params
    params = load_params(name, str(dst))

    # tensor-exact vs the direct conversion of the state_dict
    direct = convert_state_dict(sd)
    assert set(params.keys()) == set(direct.keys())
    for k in direct:
        np.testing.assert_array_equal(np.asarray(params[k]), direct[k], err_msg=k)

    # and our JAX forward consumes them (key/shape compatibility; value
    # parity vs torch is covered by the golden fixtures, which use these
    # exact schemas — finiteness is NOT asserted because 0.3-scale random
    # weights legitimately overflow deep nets like sfd2)
    import jax.numpy as jnp
    from keypoint_bench_tpu.models import get_model
    rg = np.random.default_rng(3)
    img = jnp.asarray(rg.random((1, 64, 64, 3), np.float32))
    score, desc = get_model(name)(dict(params), img)
    assert score.ndim == 4 and score.shape[0] == 1 and score.shape[-1] == 1


@pytest.mark.parametrize("features,fname,spec_name,dim", [
    ("superpoint", "superpoint_lightglue.pth", "lightglue_superpoint", 256),
    ("disk", "disk_lightglue.pth", "lightglue_disk", 128),
])
def test_lightglue_variant_pth_convert_roundtrip(tmp_path, features, fname,
                                                 spec_name, dim):
    """Extend the aliked round-trip (test_lightglue_aliked_convert.py) to
    the superpoint/disk LightGlue schemas, with torch-forward parity."""
    _setup_ref()
    import torch
    from models.lightglue import LightGlue

    def small_randomize(model, seed):
        # 0.05 scale: see test_lightglue_aliked_convert.py — keeps the
        # 9-layer transformer comparison about conversion, not float chaos
        g = torch.Generator().manual_seed(seed)
        sd = model.state_dict()
        for k, v in sd.items():
            if not torch.is_tensor(v) or not v.dtype.is_floating_point:
                continue
            if "confidence_thresholds" in k:
                continue
            v.copy_(0.05 * torch.randn(v.shape, generator=g))
        model.load_state_dict(sd)
        return model

    orig_load = torch.load
    torch.load = lambda *a, **k: {}
    try:
        lg = LightGlue(features=features, weight_path="/nonexistent",
                       depth_confidence=-1, width_confidence=-1, flash=False)
    finally:
        torch.load = orig_load
    small_randomize(lg, 80 + dim)
    lg.eval()

    src = tmp_path / "src" / "weights"
    src.mkdir(parents=True)
    torch.save(lg.state_dict(), src / fname)
    dst = tmp_path / "npz"
    from keypoint_bench_tpu.weights.convert import main as convert_main
    convert_main(str(tmp_path / "src"), str(dst))

    from keypoint_bench_tpu.weights import load_params
    params = load_params(spec_name, str(dst))
    if dim != 256:
        assert "input_proj.weight" in params

    import jax.numpy as jnp
    from keypoint_bench_tpu.models.lightglue import lightglue_forward

    rg = np.random.default_rng(7)
    M, N = 48, 56
    kpts0 = rg.uniform(0, 511, (1, M, 2)).astype(np.float32)
    kpts1 = rg.uniform(0, 511, (1, N, 2)).astype(np.float32)
    de0 = rg.normal(0, 1, (1, M, dim)).astype(np.float32)
    de1 = rg.normal(0, 1, (1, N, dim)).astype(np.float32)
    with torch.no_grad():
        out = lg({"image0": {"keypoints": torch.from_numpy(kpts0),
                             "descriptors": torch.from_numpy(de0)},
                  "image1": {"keypoints": torch.from_numpy(kpts1),
                             "descriptors": torch.from_numpy(de1)}})
    m0_ref = out["matches0"].numpy()[0]
    ms_ref = out["matching_scores0"].numpy()[0]

    m0, ms, ok = lightglue_forward(
        dict(params), jnp.asarray(kpts0[0]), jnp.ones(M, bool),
        jnp.asarray(de0[0]), jnp.asarray(kpts1[0]), jnp.ones(N, bool),
        jnp.asarray(de1[0]))
    np.testing.assert_allclose(np.asarray(ms), ms_ref, atol=2e-3)
    decisive = np.abs(ms_ref - 0.1) > 1e-2
    np.testing.assert_array_equal(np.asarray(m0)[decisive], m0_ref[decisive])
