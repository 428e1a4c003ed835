"""Native C++ loader: PNM decode + resize parity vs cv2, ordered prefetch."""
import numpy as np
import pytest

from keypoint_bench_tpu.runtime import (NativePrefetcher, load_pnm_resized,
                                        native_available)


def _write_ppm(path, img_u8):
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


@pytest.fixture(scope="module")
def ppm_files(tmp_path_factory):
    if not native_available():
        pytest.skip("no g++ / native loader")
    d = tmp_path_factory.mktemp("ppm")
    rng = np.random.default_rng(0)
    paths, images = [], []
    for i in range(6):
        img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        p = str(d / f"img{i}.ppm")
        _write_ppm(p, img)
        paths.append(p)
        images.append(img)
    return paths, images


def test_decode_resize_matches_cv2(ppm_files):
    import cv2
    paths, images = ppm_files
    out = load_pnm_resized(paths[0], 32, 24)
    ref = cv2.resize(images[0].astype(np.float32) / 255.0, (32, 24))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_decode_identity_size(ppm_files):
    paths, images = ppm_files
    out = load_pnm_resized(paths[1], 64, 48)
    np.testing.assert_allclose(out, images[1].astype(np.float32) / 255.0,
                               atol=1e-6)


def test_prefetcher_ordered(ppm_files):
    paths, images = ppm_files
    pf = NativePrefetcher(paths, 64, 48, n_threads=3, capacity=2)
    seen = []
    for idx, frame in pf:
        seen.append(idx)
        np.testing.assert_allclose(
            frame, images[idx].astype(np.float32) / 255.0, atol=1e-6)
    pf.close()
    assert seen == list(range(len(paths)))


def test_prefetcher_s2d_layout(ppm_files):
    """s2d_block=4 frames equal host_s2d_images(plain frames) exactly —
    the prefetcher emits the Alike_s2d stem input layout during decode."""
    from keypoint_bench_tpu.models.alike_s2d import host_s2d_images
    paths, _ = ppm_files
    plain = {}
    pf = NativePrefetcher(paths, out_w=64, out_h=48)
    for idx, frame in pf:
        plain[idx] = frame
    pf.close()
    pf2 = NativePrefetcher(paths, out_w=64, out_h=48, s2d_block=4)
    n = 0
    for idx, frame in pf2:
        assert frame.shape == (12, 16, 48)
        ref = host_s2d_images(plain[idx][None])[0]
        np.testing.assert_array_equal(frame, ref)
        n += 1
    pf2.close()
    assert n == len(paths)


def test_prefetcher_s2d_rejects_indivisible(ppm_files):
    paths, _ = ppm_files
    with pytest.raises(ValueError):
        NativePrefetcher(paths, out_w=62, out_h=48, s2d_block=4)
