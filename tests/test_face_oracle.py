"""Composed cv2 oracle for the face pipeline tails.

The individual ops are covered differentially in test_filters/test_color/
test_edges_denoise; what was untested (round-3 VERDICT weak #6) is the
COMPOSITION — stage ordering, which intermediate feeds which stage, the
float blend/truncation dataflow, and the branch layouts of the two tails
(script: FaceEnhancement.py:317-459; GUI: AI_classification.py:707-768).

This file re-composes the whole chain in-process with cv2 (minus the
CascadeClassifier, which this cv2 5.0 build dropped — eye boxes are a
FIXED list passed to both sides, exactly the detector/math split used by
tpuimage.pipelines.face.enhance_face) and compares end-to-end outputs.

Channel order: the reference works in BGR (R += warmth on its channel 2);
the oracle works on the same pixels in RGB using the RGB2* cvtColor codes
(identical math — cv2's BGR2YCrCb on BGR equals RGB2YCrCb on RGB) with
the warmth roles on RGB channels 0/2, matching face.py's documented
convention.

Test structure (two layers, measured on this cv2 build):

1. ``test_stage_transforms_match_cv2`` / ``test_pre_eye_chain_matches_cv2``
   — every stage evaluated on the ORACLE's own intermediate input, so
   nothing cascades: each is within the repo float contract (max +-2 on
   <6% of pixels; CLAHE is the 6% — its tile-histogram mapping shifts a
   whole tile when one input pixel wobbles). This layer pins stage
   ordering AND each transform tightly: feeding the wrong intermediate
   or swapping stages measures tens of levels.
2. ``test_composed_tail_matches_cv2`` — the fully composed pipelines.
   Divergence here is AMPLIFICATION, not error: the u8 HSV round trip
   turns +-1 RGB wobble into +-6 (hue bin flips), CLAHE spreads any
   single-pixel difference across its whole tile, and the amount-2.0
   unsharp multiplies by (1+2); measured on this build the gaussian/
   script path lands at max 37, 23% nonzero, MEAN 0.56 with every
   stage individually +-2 (the per-stage layer above proves it).
   Bounds are those measured values with ~2x headroom — a composition
   bug still clears them by an order of magnitude (mean >> 2).
"""
import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tpuimage.io.imageio import load_image_rgb
from tpuimage.pipelines import face

FACE = "/root/reference/public/facewithnoise.jpg"

# fixed eye boxes (x, y, w, h): two plausible overlapping-free eyes plus a
# box clipped by the bottom edge to pin the out-of-bounds slice semantics
EYES = [(60, 150, 80, 80), (200, 148, 82, 82), (140, 540, 60, 60)]


# ---------------------------------------------------------------------------
# cv2 composition (reference dataflow, RGB coordinates)
# ---------------------------------------------------------------------------

def _skin_mask(rgb_light):
    # FaceEnhancement.py:101-122
    ycrcb = cv2.cvtColor(rgb_light, cv2.COLOR_RGB2YCrCb)
    lo = np.array([0, 133, 77], dtype=np.uint8)
    hi = np.array([255, 173, 127], dtype=np.uint8)
    mask = cv2.inRange(ycrcb, lo, hi)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k)
    mask = cv2.dilate(mask, k, iterations=2)
    return cv2.GaussianBlur(mask, (21, 21), 0)


def _blend(a, b, mask):
    # FaceEnhancement.py:139-144 — float blend, trunc cast
    m = (mask.astype(float) / 255.0)[..., None]
    return (a * m + b * (1.0 - m)).astype(np.uint8)


def _glamour(rgb, mask):
    # FaceEnhancement.py:127-144
    smooth = cv2.bilateralFilter(rgb, d=-1, sigmaColor=30, sigmaSpace=10)
    return _blend(smooth, rgb, mask)


def _enhance_details(rgb, amount):
    # FaceEnhancement.py:149-168
    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    l, a, b = cv2.split(lab)
    blurred = cv2.GaussianBlur(l, (0, 0), 3)
    sharp = cv2.addWeighted(l, 1.0 + amount, blurred, -amount, 0)
    return cv2.cvtColor(cv2.merge([sharp, a, b]), cv2.COLOR_LAB2RGB)


def _eye_pop(rgb, eyes):
    # FaceEnhancement.py:173-230 with the cascade replaced by `eyes`
    out = rgb.copy()
    for (x, y, w, h) in eyes:
        roi = out[y:y + h, x:x + w]
        if roi.size == 0:
            continue
        roi = cv2.medianBlur(roi, 3)
        lab = cv2.cvtColor(roi, cv2.COLOR_RGB2LAB)
        l, a, b = cv2.split(lab)
        l = cv2.createCLAHE(clipLimit=0.2, tileGridSize=(4, 4)).apply(l)
        enh = cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_LAB2RGB)
        enh = _enhance_details(enh, amount=0.5)
        # ellipse mask at the roi's ACTUAL (possibly edge-clipped) shape:
        # the reference builds it at the full box size, but its cascade
        # never returns out-of-bounds boxes (the float blend would raise
        # on a shape mismatch), so clipped-box semantics are tpuimage-
        # defined — face._eye_roi_enhance derives the ellipse from the
        # clipped roi, and the oracle mirrors that definition
        ah, aw = roi.shape[:2]
        mask = np.zeros((ah, aw), dtype=np.uint8)
        cv2.ellipse(mask, (aw // 2, ah // 2), (aw // 2, ah // 2), 0, 0, 360,
                    255, -1)
        soft = cv2.GaussianBlur(mask, (31, 31), 0)
        alpha = (soft.astype(float) / 255.0 * 0.1)[..., None]
        blended = (enh.astype(float) * alpha
                   + roi.astype(float) * (1.0 - alpha))
        out[y:y + h, x:x + w] = blended.astype(np.uint8)
    return out


def _saturation(rgb, s_mul):
    # FaceEnhancement.py:235-249
    hsv = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV)
    h, s, v = cv2.split(hsv)
    s = np.clip(s.astype(float) * s_mul, 0, 255).astype(np.uint8)
    return cv2.cvtColor(cv2.merge([h, s, v]), cv2.COLOR_HSV2RGB)


def _warmth(rgb, amount):
    # FaceEnhancement.py:251-264 (R/B roles on RGB channels 0/2)
    x = rgb.astype(float)
    x[..., 0] += amount
    x[..., 2] -= amount * 0.05
    return np.clip(x, 0, 255).astype(np.uint8)


def _stretch(rgb):
    # FaceEnhancement.py:266-278
    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    l, a, b = cv2.split(lab)
    l = cv2.normalize(l, None, 0, 255, cv2.NORM_MINMAX)
    return cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_LAB2RGB)


def _clahe_eq(rgb):
    # FaceEnhancement.py:281-295
    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    l, a, b = cv2.split(lab)
    l = cv2.createCLAHE(clipLimit=0.5, tileGridSize=(8, 8)).apply(l)
    return cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_LAB2RGB)


def _masked_sharpen(rgb, mask, amount):
    # FaceEnhancement.py:297-312
    sharp_face = _enhance_details(rgb, amount)
    sharp_bg = _enhance_details(rgb, amount * 0.5)
    m = (mask.astype(float) / 255.0)[..., None]
    return (sharp_face * m + sharp_bg * (1.0 - m)).astype(np.uint8)


def cv2_face(rgb, noise_type, eyes, variant):
    """The full script (:317-459) / GUI (:707-768) tail, cv2-composed."""
    if noise_type == "gaussian":
        light = cv2.GaussianBlur(rgb, (5, 5), 0)
        strong = cv2.GaussianBlur(rgb, (9, 9), 0)
    else:  # impulse
        light = cv2.medianBlur(rgb, 3)
        strong = cv2.medianBlur(rgb, 5)
    mask = _skin_mask(light)
    combined = _blend(light, strong, mask)
    skin = _glamour(combined, mask)
    popped = _eye_pop(skin, eyes)
    if variant == "gui":
        # AI_classification.py:750: val_sat = 1.2 if gaussian else 1.0 —
        # the sat-1.0 call still runs the lossy u8 HSV round trip
        x = _saturation(popped, 1.2 if noise_type == "gaussian" else 1.0)
    else:
        x = _saturation(popped, 1.2)
    x = _warmth(x, 15)
    if noise_type == "gaussian":
        x = _clahe_eq(x)
        x = cv2.bilateralFilter(x, d=5, sigmaColor=20, sigmaSpace=20)
        if variant == "script":
            x = _masked_sharpen(x, mask, 2.0)
        return x
    x = _stretch(x)  # impulse: ends at the stretch in both variants
    return x


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def portrait():
    return load_image_rgb(FACE)


def _diff_stats(ours, oracle):
    d = np.abs(ours.astype(int) - oracle.astype(int))
    return d.max(), (d > 0).mean(), d.mean()


def _oracle_intermediates(rgb, noise_type):
    """The oracle chain's intermediates up to the tail input."""
    if noise_type == "gaussian":
        light = cv2.GaussianBlur(rgb, (5, 5), 0)
        strong = cv2.GaussianBlur(rgb, (9, 9), 0)
    else:
        light = cv2.medianBlur(rgb, 3)
        strong = cv2.medianBlur(rgb, 5)
    mask = _skin_mask(light)
    combined = _blend(light, strong, mask)
    skin = _glamour(combined, mask)
    popped = _eye_pop(skin, EYES)
    return mask, skin, popped


def test_pre_eye_chain_matches_cv2(portrait):
    """Denoise -> skin mask -> blend -> glamour -> eye pop, each pipeline
    intermediate vs the oracle's (gaussian branch; impulse covered by the
    stage layer + composed bounds)."""
    import jax.numpy as jnp
    mask_o, skin_o, popped_o = _oracle_intermediates(portrait, "gaussian")
    pre = face.face_pre_eyes(jnp.asarray(portrait), noise_type="gaussian")
    assert np.array_equal(np.asarray(pre["skin_mask"]), mask_o)
    mx, frac, _ = _diff_stats(np.asarray(pre["skin_enhanced"]), skin_o)
    assert mx <= 2 and frac < 0.01, (mx, frac)   # measured (2, 0.06%)
    popped_p = face.pixel_pop_eyes(np.asarray(pre["skin_enhanced"]), EYES)
    mx, frac, _ = _diff_stats(popped_p, popped_o)
    assert mx <= 2 and frac < 0.02, (mx, frac)   # measured (2, 0.48%)


def test_stage_transforms_match_cv2(portrait):
    """Each tail stage on the ORACLE's own input — nothing cascades, so
    the bounds are the per-op float contract. This is the tight guard on
    stage semantics + the intermediate each consumes; measured values in
    the trailing comments."""
    import jax.numpy as jnp
    from tpuimage.ops.bilateral import bilateral_filter
    mask_o, _, popped_o = _oracle_intermediates(portrait, "gaussian")
    sat_o = _saturation(popped_o, 1.2)
    warm_o = _warmth(sat_o, 15)
    cl_o = _clahe_eq(warm_o)
    bi_o = cv2.bilateralFilter(cl_o, d=5, sigmaColor=20, sigmaSpace=20)
    sh_o = _masked_sharpen(bi_o, mask_o, 2.0)
    st_o = _stretch(warm_o)
    checks = [
        ("sat", face.adjust_saturation(jnp.asarray(popped_o), 1.2),
         sat_o, 0.02),                                  # (1, 0.8%)
        ("warmth", face.apply_warmth(jnp.asarray(sat_o), 15.0),
         warm_o, 0.0),                                  # (0, 0) — exact
        ("clahe_eq", face.apply_histogram_equalization(jnp.asarray(warm_o)),
         cl_o, 0.10),                                   # (2, 4.7%)
        ("bilateral", bilateral_filter(jnp.asarray(cl_o), 5, 20, 20),
         bi_o, 0.001),                                  # (1, 0.001%)
        ("sharpen", face.apply_masked_sharpening(
            jnp.asarray(bi_o), jnp.asarray(mask_o), amount=2.0),
         sh_o, 0.11),                                   # (2, 5.1%)
        ("stretch", face.apply_contrast_stretching(jnp.asarray(warm_o)),
         st_o, 0.10),
    ]
    for name, ours, oracle, frac_bound in checks:
        mx, frac, mean = _diff_stats(np.asarray(ours), oracle)
        # max 3: CLAHE's blend hits a third boundary flip on XLA:CPU
        # (the TPU backend measures 2 — FMA contraction differs)
        assert mx <= 3, (name, mx, frac, mean)
        assert frac <= frac_bound, (name, mx, frac, mean)


# composed bounds: measured (max, frac, mean) with ~2x headroom — see the
# module docstring for why amplification, not error, sets these scales
_COMPOSED_BOUNDS = {
    ("gaussian", "script"): (80, 0.45, 1.3),   # measured (37, 0.232, 0.564)
    ("gaussian", "gui"): (50, 0.30, 0.60),     # measured (21, 0.145, 0.247)
    ("impulse", "script"): (25, 0.13, 0.20),   # measured (9, 0.062, 0.080)
    ("impulse", "gui"): (25, 0.13, 0.20),      # measured (7, 0.054, 0.070)
}


@pytest.mark.parametrize("noise_type,variant", [
    ("gaussian", "script"),   # the path that produced enhanced_face.jpg
    ("gaussian", "gui"),
    ("impulse", "script"),
    ("impulse", "gui"),
])
def test_composed_tail_matches_cv2(portrait, noise_type, variant):
    oracle = cv2_face(portrait, noise_type, EYES, variant)
    ours = face.enhance_face(portrait, noise_type=noise_type, eyes=EYES,
                             variant=variant)["final"]
    assert ours.shape == oracle.shape
    mx, frac, mean = _diff_stats(ours, oracle)
    bmx, bfrac, bmean = _COMPOSED_BOUNDS[(noise_type, variant)]
    assert mx <= bmx, (mx, frac, mean)
    assert frac < bfrac, (mx, frac, mean)
    assert mean < bmean, (mx, frac, mean)


def test_eye_pop_alone_matches_cv2(portrait):
    """Eye-pop stage differentially (incl. the edge-clipped box)."""
    oracle = _eye_pop(portrait, EYES)
    ours = face.pixel_pop_eyes(portrait, EYES)
    mx, frac, mean = _diff_stats(ours, oracle)
    # alpha caps at 0.1 so the blend moves pixels by <= ~25 levels; the
    # only disagreement sources are cv2.ellipse's polygon rasterization
    # vs the analytic ellipse (boundary ring, feathered by the 31x31
    # blur then x0.1) and the +-1 CLAHE wobble. measured: max 1, 0.04%.
    assert mx <= 2, (mx, frac, mean)
    assert frac < 0.01, (mx, frac, mean)


def test_gui_impulse_runs_sat1_round_trip(portrait):
    """AI_classification.py:750 passes saturation=1.0 for non-gaussian —
    NOT a no-op: the u8 HSV round trip quantizes H to 2-degree bins. The
    pipeline must reproduce that lossy round trip, not skip the call."""
    popped = cv2.medianBlur(portrait, 3)
    rt = _saturation(popped, 1.0)
    assert not np.array_equal(rt, popped)  # lossy on this portrait
