"""Property tests for the pure-numpy multimodal kernels (no Spark):
PPM/PPMV1 round-trips, resize invariants, resample length law."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from recsplit_spark.pipeline import multimodal as mm


@st.composite
def _images(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ch = draw(st.sampled_from([1, 3]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    return img[:, :, 0] if ch == 1 else img


@settings(max_examples=60, deadline=None)
@given(_images())
def test_ppm_roundtrip_property(img):
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(_images(max_side=10), min_size=1, max_size=6),
    st.floats(0.5, 60.0),
)
def test_ppmv1_roundtrip_property(frames, fps):
    # the container accepts heterogeneous frame shapes — each frame is
    # its own PPM blob behind the offset table
    blob = mm.encode_ppm_video(frames, fps)
    got_fps, n, offs = mm.ppm_video_info(blob)
    assert n == len(frames) and got_fps == fps
    assert int(offs[-1]) == len(blob)
    for i, f in enumerate(frames):
        assert np.array_equal(mm.decode_ppm_video_frame(blob, i), f)


@settings(max_examples=60, deadline=None)
@given(_images(), st.integers(1, 40), st.integers(1, 40))
def test_resize_shape_and_range_property(img, oh, ow):
    out = mm.resize_image(img, oh, ow)
    want_shape = (oh, ow) if img.ndim == 2 else (oh, ow, img.shape[2])
    assert out.shape == want_shape
    # area means / nearest picks stay inside the input value range
    # (+-1 for the rint at the edges of the mean)
    assert out.min() >= max(0, int(img.min()) - 1)
    assert out.max() <= min(255, int(img.max()) + 1)
    # constant image stays constant under any resize
    const = np.full_like(img, 77)
    assert np.all(mm.resize_image(const, oh, ow) == 77)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 2000),
    st.sampled_from([1, 2]),
    st.sampled_from([4000, 8000, 16000, 22050, 44100]),
    st.sampled_from([4000, 8000, 16000, 22050, 44100]),
    st.integers(0, 2**31 - 1),
)
def test_resample_length_law_property(n, ch, r_in, r_out, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32767, (n, ch), dtype=np.int16)
    out = mm.resample_audio_samples(s, r_in, r_out)
    assert out.shape == (max(1, int(round(n * r_out / r_in))), ch)
    assert out.dtype == np.int16
    # value range never exceeds the input envelope (linear interp is a
    # convex combination; rint can't escape int16 after the clip)
    assert out.min() >= s.min() and out.max() <= s.max()


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 500), st.floats(0.5, 60.0), st.floats(0.01, 10.0))
def test_frame_plan_n_covers_first_and_within_range(n, fps, every_s):
    plan = mm.frame_sample_plan_n(n, fps, every_s)
    assert plan[0] == 0
    assert all(0 <= i < n for i in plan)
    step = max(1, round(fps * every_s))
    assert plan == list(range(0, n, step))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2000), st.sampled_from([1, 2]), st.integers(0, 2**31 - 1))
def test_audio_fingerprint_volume_invariance_property(n, ch, seed):
    rng = np.random.default_rng(seed)
    # keep headroom so x2 / x4 scaling is EXACT in int16
    s = rng.integers(-8192, 8192, (n, ch) if ch == 2 else (n,), dtype=np.int16)
    f = mm.audio_fingerprint(s)
    assert -(2**63) <= f < 2**63
    assert mm.audio_fingerprint(s) == f  # deterministic
    for c in (2, 4):
        assert mm.audio_fingerprint((s.astype(np.int32) * c).astype(np.int16)) == f
    if ch == 2:
        # equal channels mix down to the mono clip exactly
        assert mm.audio_fingerprint(
            np.stack([s[:, 0], s[:, 0]], axis=1)
        ) == mm.audio_fingerprint(s[:, 0])
    if n == 0:
        assert f == 0


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**20), st.sampled_from([12000, 16000, 11025]))
def test_audio_fingerprint_resample_robustness_property(seed, out_rate):
    base = mm._seeded_clip(seed)
    f0 = mm.audio_fingerprint(base)
    res = mm.resample_audio_samples(base, 8000, out_rate)
    d = bin((f0 ^ mm.audio_fingerprint(res)) & (2**64 - 1)).count("1")
    # measured worst over 18k seeds in this strategy space is 7 (~1% of
    # seeds exceed 4): near-equal adjacent block energies can flip under
    # interpolation. The near-dup default max_hamming=6 still catches the
    # typical case; this asserts the tail bound, not the typical distance.
    assert d <= 8
