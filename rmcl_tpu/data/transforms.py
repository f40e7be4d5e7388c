"""Host-side image transforms: pixelbert resize + RandAugment.

Behavioural spec: reference vilt/transforms/{utils.py,pixelbert.py,
randaug.py}.  Pure PIL + numpy (no torch, no torchvision): transforms run
on the TPU host CPU inside the input pipeline.

Output convention: channels-LAST float32 (H, W, 3), normalized
(x/255 - 0.5)/0.5 — the model's patchify consumes (B, H, W, 3)
(rmcl_tpu/models/vit.py patchify); the reference is channels-first.

Static-shape note (TPU): the reference pads each batch to the batch max
H×W (reference base_dataset.py:184-206), recompiling-hostile under XLA.
Here each image additionally fits inside the configured static bucket:
if a resized image exceeds the bucket on either side it is rescaled to
fit (same /32-rounding rules).  With bucket (608, 608) no image ever
exceeds it for size=384, so reference sizing is reproduced exactly;
smaller buckets trade a small resize divergence for fewer padded patches
(documented divergence, cf. EVAL.md:2's own padding-sensitivity caveat).
"""

from __future__ import annotations



from rmcl_tpu.data.rng import srandom
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


# ------------------------------------------------------------ resize math
def min_max_size(w: int, h: int, shorter: int, longer: int) -> Tuple[int, int]:
    """(new_w, new_h) after MinMaxResize rules (reference
    vilt/transforms/utils.py:5-27): scale shorter side to `shorter`, cap
    longer side at `longer`, round half-up then floor to /32."""
    scale = shorter / min(w, h)
    if h < w:
        newh, neww = shorter, scale * w
    else:
        newh, neww = scale * h, shorter
    if max(newh, neww) > longer:
        s2 = longer / max(newh, neww)
        newh, neww = newh * s2, neww * s2
    newh, neww = int(newh + 0.5), int(neww + 0.5)
    return (neww // 32 * 32, newh // 32 * 32)


def min_max_resize(img: Image.Image, shorter: int = 800,
                   longer: int = 1333) -> Image.Image:
    w, h = img.size
    neww, newh = min_max_size(w, h, shorter, longer)
    return img.resize((neww, newh), resample=Image.BICUBIC)


def fit_bucket(img: Image.Image, bucket_hw: Tuple[int, int]) -> Image.Image:
    """If the resized image exceeds the static bucket, rescale to fit
    (keep aspect, /32 floor)."""
    bh, bw = bucket_hw
    w, h = img.size
    if w <= bw and h <= bh:
        return img
    s = min(bw / w, bh / h)
    neww = max(int(w * s) // 32 * 32, 32)
    newh = max(int(h * s) // 32 * 32, 32)
    return img.resize((neww, newh), resample=Image.BICUBIC)


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """(H, W, 3) float32 in [-1, 1] — ToTensor + inception_normalize
    (reference transforms/utils.py:46-49)."""
    return normalize_u8_array(np.asarray(img.convert("RGB"), np.uint8))


def normalize_u8_array(arr: np.ndarray) -> np.ndarray:
    """uint8 -> float32 (x/255 - 0.5)/0.5 — the ONE host-side copy of
    the normalize op order.  PARITY #26's bit-exactness guarantee
    depends on every site (this, the C++ LUT ip_normalize_hwc, and the
    device normalize models/vit.py:_normalize_u8) keeping exactly this
    f32 sequence; do not algebraically rewrite one copy."""
    return (arr.astype(np.float32) / 255.0 - 0.5) / 0.5


# ------------------------------------------------------------- randaug ops
def _autocontrast(img, _):
    return ImageOps.autocontrast(img)


def _equalize(img, _):
    return ImageOps.equalize(img)


def _rotate(img, v):
    if srandom.random() > 0.5:
        v = -v
    return img.rotate(v)


def _posterize(img, v):
    return ImageOps.posterize(img, max(1, int(v)))


def _solarize(img, v):
    return ImageOps.solarize(img, int(v))


def _solarize_add(img, v, thresh=128):
    arr = np.asarray(img).astype(np.int64)
    out = np.where(arr < thresh, np.clip(arr + int(v), 0, 255), arr)
    return Image.fromarray(out.astype(np.uint8))


def _color(img, v):
    return ImageEnhance.Color(img).enhance(v)


def _contrast(img, v):
    return ImageEnhance.Contrast(img).enhance(v)


def _brightness(img, v):
    return ImageEnhance.Brightness(img).enhance(v)


def _sharpness(img, v):
    return ImageEnhance.Sharpness(img).enhance(v)


def _shear_x(img, v):
    if srandom.random() > 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0))


def _shear_y(img, v):
    if srandom.random() > 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0))


def _translate_x_abs(img, v):
    if srandom.random() > 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0))


def _translate_y_abs(img, v):
    if srandom.random() > 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v))


# active 14-op policy (reference randaug.py:181-201, TPU autoaugment list)
RANDAUG_OPS = [
    (_autocontrast, 0, 1),
    (_equalize, 0, 1),
    (_rotate, 0, 30),
    (_posterize, 0, 4),
    (_solarize, 0, 256),
    (_solarize_add, 0, 110),
    (_color, 0.1, 1.9),
    (_contrast, 0.1, 1.9),
    (_brightness, 0.1, 1.9),
    (_sharpness, 0.1, 1.9),
    (_shear_x, 0.0, 0.3),
    (_shear_y, 0.0, 0.3),
    (_translate_x_abs, 0.0, 100),
    (_translate_y_abs, 0.0, 100),
]


class RandAugment:
    """n ops at magnitude m/30 of each range (reference randaug.py:258-274)."""

    def __init__(self, n: int = 2, m: int = 9):
        self.n, self.m = n, m

    def __call__(self, img: Image.Image) -> Image.Image:
        for op, lo, hi in srandom.choices(RANDAUG_OPS, k=self.n):
            v = (self.m / 30.0) * (hi - lo) + lo
            img = op(img, v)
        return img


# --------------------------------------------------- native fast path
def _native_imageproc():
    from rmcl_tpu.data import _native
    return _native.load_imageproc()


def _native_resize(lib, arr: np.ndarray, neww: int, newh: int) -> np.ndarray:
    import ctypes
    h, w, c = arr.shape
    out = np.empty((newh, neww, c), np.uint8)
    rc = lib.ip_resize_bicubic_u8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        newh, neww, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:  # pragma: no cover - defensive
        raise RuntimeError("ip_resize_bicubic_u8 failed")
    return out


def _native_pixelbert(lib, img: Image.Image, size: int, longer: int,
                      bucket_hw: Optional[Tuple[int, int]],
                      out_dtype: str = "float32") -> np.ndarray:
    """C++ resize chain + fused normalize — BIT-IDENTICAL to the PIL
    path (ip_resize_bicubic_u8 reproduces Pillow's fixed-point bicubic
    exactly; parity asserted in tests/test_extensions.py).  With
    out_dtype="uint8" the normalize is skipped — the device applies the
    identical (x/255 - 0.5)/0.5 at program entry (PARITY #26)."""
    import ctypes
    arr = np.ascontiguousarray(np.asarray(img.convert("RGB"), np.uint8))
    h, w = arr.shape[:2]
    neww, newh = min_max_size(w, h, size, longer)
    if (newh, neww) != (h, w):
        arr = _native_resize(lib, arr, neww, newh)
        h, w = newh, neww
    if bucket_hw is not None and (w > bucket_hw[1] or h > bucket_hw[0]):
        bh, bw = bucket_hw
        s = min(bw / w, bh / h)
        neww = max(int(w * s) // 32 * 32, 32)
        newh = max(int(h * s) // 32 * 32, 32)
        arr = _native_resize(lib, arr, neww, newh)
        h, w = newh, neww
    if out_dtype == "uint8":
        return arr
    out = np.empty((h, w, 3), np.float32)
    lib.ip_normalize_hwc(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


# ------------------------------------------------------------- pipelines
def pixelbert_transform(size: int = 800,
                        bucket_hw: Optional[Tuple[int, int]] = None,
                        randaug: bool = False,
                        out_dtype: str = "float32") -> Callable:
    """PIL -> (H, W, 3) float32 in [-1, 1] (reference pixelbert.py:8-30),
    or raw uint8 when out_dtype="uint8" (device-side normalize, 4x less
    host->device traffic; see models/vit.py normalize_image_inputs).

    Uses the native C++ resize+normalize (data/_native/imageproc.cpp)
    when available — bit-identical results, one fused pass instead of
    PIL resize(s) + numpy normalize."""
    longer = int((1333 / 800) * size)
    ra = RandAugment(2, 9) if randaug else None

    def tr(img: Image.Image) -> np.ndarray:
        if ra is not None:
            img = ra(img)
        lib = _native_imageproc()
        if lib is not None:
            return _native_pixelbert(lib, img, size, longer, bucket_hw,
                                     out_dtype)
        img = min_max_resize(img, shorter=size, longer=longer)
        if bucket_hw is not None:
            img = fit_bucket(img, bucket_hw)
        if out_dtype == "uint8":
            return np.ascontiguousarray(
                np.asarray(img.convert("RGB"), np.uint8))
        return to_normalized_array(img)

    return tr


_TRANSFORMS = {
    "pixelbert": lambda size, bucket, dt: pixelbert_transform(
        size, bucket, False, dt),
    "pixelbert_randaug": lambda size, bucket, dt: pixelbert_transform(
        size, bucket, True, dt),
}


def keys_to_transforms(keys: Sequence[str], size: int,
                       bucket_hw: Optional[Tuple[int, int]] = None,
                       out_dtype: str = "float32") -> List[Callable]:
    """Registry (reference vilt/transforms/__init__.py:6-13)."""
    return [_TRANSFORMS[k](size, bucket_hw, out_dtype) for k in keys]
