"""Native host runtime: frame queue, fused preprocessing, recorder."""

import threading

import numpy as np
import pytest

from mrs_optic_flow_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_queue_roundtrip():
    q = native.FrameQueue(capacity=4, frame_shape=(8, 8))
    f = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert q.push(f, 1.5)
    assert len(q) == 1
    out, stamp = q.pop()
    np.testing.assert_array_equal(out, f)
    assert stamp == 1.5
    assert q.pop() is None


def test_queue_overflow_drops():
    q = native.FrameQueue(capacity=2, frame_shape=(4,))
    f = np.zeros(4, np.uint8)
    assert q.push(f, 0.0) and q.push(f, 1.0)
    assert not q.push(f, 2.0)  # full
    assert q.dropped == 1


def test_queue_pop_latest():
    q = native.FrameQueue(capacity=8, frame_shape=(2,))
    for i in range(5):
        q.push(np.full(2, i, np.uint8), float(i))
    frame, stamp, skipped = q.pop_latest()
    assert frame[0] == 4 and stamp == 4.0 and skipped == 4
    assert len(q) == 0


def test_queue_threaded_spsc():
    q = native.FrameQueue(capacity=64, frame_shape=(16,))
    n = 500
    got = []

    def producer():
        i = 0
        while i < n:
            if q.push(np.full(16, i % 251, np.uint8), float(i)):
                i += 1

    def consumer():
        while len(got) < n:
            item = q.pop()
            if item is not None:
                got.append(item)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(); tc.join()
    assert len(got) == n
    # FIFO order and data integrity
    for i, (frame, stamp) in enumerate(got):
        assert stamp == float(i)
        assert frame[0] == i % 251


def test_gray_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    bgr = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
    # correct BGR conversion: 0.299 weight on channel 2
    ours = native.bgr_to_gray(bgr, swap_rb=False)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    # the reference's quirk: CV_RGB2GRAY applied to the same BGR buffer
    # (0.299 weight lands on channel 0; src/optic_flow.cpp:1622)
    ours_q = native.bgr_to_gray(bgr, swap_rb=True)
    ref_q = cv2.cvtColor(bgr, cv2.COLOR_RGB2GRAY)
    assert np.abs(ours_q.astype(int) - ref_q.astype(int)).max() <= 1


def test_gray_crop_fused(rng):
    img = rng.integers(0, 255, size=(480, 752, 3)).astype(np.uint8)
    fused = native.gray_crop(img, cx=376, cy=240, size=480)
    full = native.bgr_to_gray(img)
    ref = full[0:480, 136:616]
    np.testing.assert_array_equal(fused, ref)
    # clamped at the border
    edge = native.gray_crop(img, cx=10, cy=10, size=128)
    np.testing.assert_array_equal(edge, full[0:128, 0:128])
    # clamped at the FAR border too (the origin clamp must never go
    # negative: x0 = w - size then re-clamped to >= 0)
    far = native.gray_crop(img, cx=750, cy=475, size=128)
    np.testing.assert_array_equal(far, full[480 - 128:480, 752 - 128:752])


def test_crop_size_exceeding_image_rejected(rng):
    import pytest

    img = rng.integers(0, 255, size=(64, 48, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="exceeds"):
        native.gray_crop(img, cx=24, cy=32, size=128)
    with pytest.raises(ValueError, match="exceeds"):
        native.crop(img[..., 0].copy(), cx=24, cy=32, size=128)


def test_recorder_roundtrip(tmp_path, rng):
    path = str(tmp_path / "stream.ofrec")
    frames = [rng.integers(0, 255, size=(32, 40)).astype(np.uint8) for _ in range(5)]
    with native.Recorder(path, width=40, height=32) as rec:
        for i, f in enumerate(frames):
            rec.write(100.0 + i * 0.05, f)
    with native.Replay(path) as rep:
        assert rep.n_frames == 5
        assert rep.frame_shape == (32, 40)
        for i, (stamp, frame) in enumerate(rep):
            assert stamp == pytest.approx(100.0 + i * 0.05)
            np.testing.assert_array_equal(frame, frames[i])
        # random access
        stamp, frame = rep.read(3)
        np.testing.assert_array_equal(frame, frames[3])
    with pytest.raises(OSError):
        native.Replay(str(tmp_path / "missing.ofrec"))


def test_jax_grayscale_matches_native_and_opencv(rng):
    """ops.preprocess.to_grayscale agrees mode-for-mode with the native
    fixed-point kernel and cv2: swap_rb=True is the reference's
    CV_RGB2GRAY-on-BGR quirk (0.299 on channel 0, src/optic_flow.cpp:1622),
    False the colorimetric BGR conversion."""
    import jax.numpy as jnp

    from mrs_optic_flow_tpu.ops.preprocess import quantize_u8, to_grayscale

    bgr = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
    for swap_rb in (True, False):
        ours = np.asarray(
            quantize_u8(to_grayscale(jnp.asarray(bgr), swap_rb=swap_rb))
        )
        theirs = native.bgr_to_gray(bgr, swap_rb=swap_rb)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1

    cv2 = pytest.importorskip("cv2")
    quirk = np.asarray(quantize_u8(to_grayscale(jnp.asarray(bgr))))
    ref_q = cv2.cvtColor(bgr, cv2.COLOR_RGB2GRAY)
    assert np.abs(quirk.astype(int) - ref_q.astype(int)).max() <= 1
