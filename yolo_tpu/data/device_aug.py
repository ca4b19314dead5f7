"""Device-side (TPU) training augmentation: mosaic + affine + HSV + flip.

Why: the host in production TPU pods has few CPU cores per chip; the
reference's cv2 pipeline (utils/datasets.py:534-715) caps at ~100 img/s on
one core while a v5e consumes ~274 img/s at 416px. Here the host only
decodes + letterboxes (its hard ceiling is JPEG decode), and all the random
augmentation runs inside one jitted XLA program on the accelerator —
fixed shapes, vmapped over the batch, PRNG from `jax.random`.

Semantics mirror the host pipeline (data/transforms.py):

- mosaic: 4 letterboxed images on a 2s x 2s canvas (quadrants are the batch
  rolled by 3 random offsets — every output still mixes 4 distinct images),
  then the affine stage crops a random s-window (reference load_mosaic +
  random_affine(border=-s/2), utils/datasets.py:553-608);
- affine: rotation/scale/shear/translate as one inverse bilinear warp
  (cv2.warpAffine equivalent) with the grey 114 border, plus the reference's
  box candidate filter (w,h > 4px of the warp output? — 4px at full res;
  area ratio > 0.2, aspect < 10; utils/datasets.py:700-715);
- HSV jitter in float (the reference uses uint8 LUTs; numerics agree to
  quantisation), lr-flip with probability 0.5.

Labels ride through as the fixed-capacity (max_t, 6) [img, cls, xywh-norm]
tensor with a validity mask; dropped boxes just clear their mask bit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

PAD = 114.0 / 255.0


# ---------------------------------------------------------------------------
# colour
# ---------------------------------------------------------------------------

def rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, (g - b) / safe % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0)) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(img, key, hgain, sgain, vgain):
    g = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0) * \
        jnp.asarray([hgain, sgain, vgain]) + 1.0
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] * g[0]) % 1.0
    s = jnp.clip(hsv[..., 1] * g[1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * g[2], 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


# ---------------------------------------------------------------------------
# affine warp
# ---------------------------------------------------------------------------

def _affine_matrix(key, src_hw, degrees, translate, scale, shear, border,
                   window_jitter: float = 0.0):
    """Forward 3x3 matrix M, reference random_affine composition
    (S @ T @ R, transforms.py:104-113).

    ``window_jitter`` adds a uniform +-jitter to the translation — the
    device-mosaic equivalent of the host mosaic's random centre
    (xc, yc ~ U(0.5s, 1.5s), datasets.py load_mosaic): without it the
    default hyps (translate=0) would crop the same fixed canvas window
    every step."""
    ka, ks, ktx, kty, ksx, ksy, kwx, kwy = jax.random.split(key, 8)
    a = jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
    s = jax.random.uniform(ks, (), minval=1 - scale, maxval=1 + scale)
    wx = jax.random.uniform(kwx, (), minval=-window_jitter,
                            maxval=window_jitter)
    wy = jax.random.uniform(kwy, (), minval=-window_jitter,
                            maxval=window_jitter)
    rad = -a * jnp.pi / 180.0          # cv2.getRotationMatrix2D is ccw for +angle
    ca, sa = jnp.cos(rad) * s, jnp.sin(rad) * s
    cx, cy = src_hw[1] / 2.0, src_hw[0] / 2.0
    # R: rotate/scale about the source centre
    R = jnp.array([[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]])
    R = R.at[0, 0].set(ca).at[0, 1].set(sa).at[1, 0].set(-sa).at[1, 1].set(ca)
    R = R.at[0, 2].set((1 - ca) * cx - sa * cy)
    R = R.at[1, 2].set(sa * cx + (1 - ca) * cy)
    T = jnp.eye(3)
    T = T.at[0, 2].set(jax.random.uniform(ktx, (), minval=-translate,
                                          maxval=translate) * src_hw[0]
                       + border + wx)
    T = T.at[1, 2].set(jax.random.uniform(kty, (), minval=-translate,
                                          maxval=translate) * src_hw[1]
                       + border + wy)
    S = jnp.eye(3)
    S = S.at[0, 1].set(jnp.tan(jax.random.uniform(
        ksx, (), minval=-shear, maxval=shear) * jnp.pi / 180.0))
    S = S.at[1, 0].set(jnp.tan(jax.random.uniform(
        ksy, (), minval=-shear, maxval=shear) * jnp.pi / 180.0))
    return S @ T @ R, s


def _warp_scale_translate(img, sc, bx, by, out_hw):
    """Fast warp for the no-rotation/no-shear case (the default hyps):
    forward map dst = sc*src + b is exactly jax.image.scale_and_translate
    (separable resampling — no gathers, TPU-fast). Grey border via the
    subtract/add trick: linear resampling of (img - PAD) with zero fill
    equals resampling img with PAD fill."""
    oh, ow = out_hw
    shifted = img - PAD
    out = jax.image.scale_and_translate(
        shifted, (oh, ow, img.shape[2]), (0, 1),
        jnp.stack([sc, sc]), jnp.stack([by, bx]), method='linear')
    return out + PAD


def _warp(img, M_inv, out_hw):
    """Inverse-map bilinear warp with constant grey border (one image)."""
    oh, ow = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    sx = M_inv[0, 0] * xs + M_inv[0, 1] * ys + M_inv[0, 2]
    sy = M_inv[1, 0] * xs + M_inv[1, 1] * ys + M_inv[1, 2]
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            val = img[yi_c, xi_c]                          # (oh, ow, 3) gather
            val = jnp.where(inside[..., None], val, PAD)
            wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy))[..., None]
            out = out + wgt * val
    return out


# ---------------------------------------------------------------------------
# the full augmentation program
# ---------------------------------------------------------------------------

def make_device_augment(img_size: int, hyp: dict, *, mosaic: bool = True,
                        flip_lr: bool = True):
    """Build the jitted augmentation fn.

    fn(imgs (bs,s,s,3) f32 [0,1], targets (T,6), valid (T,), key) ->
       (imgs, targets (T_out,6), valid (T_out,))
    where T_out = 4*T when mosaic (each output mixes four images' labels).
    """
    s = int(img_size)
    degrees = float(hyp.get('degrees', 0.0))
    translate = float(hyp.get('translate', 0.0))
    scale = float(hyp.get('scale', 0.0))
    shear = float(hyp.get('shear', 0.0))
    hgain = float(hyp.get('hsv_h', 0.0))
    sgain = float(hyp.get('hsv_s', 0.0))
    vgain = float(hyp.get('hsv_v', 0.0))
    border = -s // 2 if mosaic else 0
    src_hw = (2 * s, 2 * s) if mosaic else (s, s)

    @jax.jit
    def augment(imgs, targets, valid, key):
        bs = imgs.shape[0]
        T = targets.shape[0]
        k_m, k_aff, k_hsv, k_flip = jax.random.split(key, 4)

        if mosaic:
            offs = jax.random.randint(k_m, (3,), 1, max(bs, 2))
            quads = [imgs,
                     jnp.roll(imgs, -offs[0], axis=0),
                     jnp.roll(imgs, -offs[1], axis=0),
                     jnp.roll(imgs, -offs[2], axis=0)]
            top = jnp.concatenate([quads[0], quads[1]], axis=2)
            bot = jnp.concatenate([quads[2], quads[3]], axis=2)
            canvas = jnp.concatenate([top, bot], axis=1)   # (bs, 2s, 2s, 3)
            # labels: replicate 4x with quadrant pixel offsets and rolled
            # image indices
            reps, vals = [], []
            qoff = [(0, 0), (0, s), (s, 0), (s, s)]        # (dy, dx)
            for q in range(4):
                o = 0 if q == 0 else offs[q - 1]
                t = targets
                img_i = (t[:, 0] - o) % bs
                dy, dx = qoff[q]
                x = t[:, 2] * s + dx
                y = t[:, 3] * s + dy
                w = t[:, 4] * s
                h = t[:, 5] * s
                reps.append(jnp.stack([img_i, t[:, 1], x, y, w, h], 1))
                vals.append(valid)
            tgt_pix = jnp.concatenate(reps, 0)             # (4T, 6) canvas px
            val = jnp.concatenate(vals, 0)
        else:
            canvas = imgs
            t = targets
            tgt_pix = jnp.stack([t[:, 0], t[:, 1], t[:, 2] * s, t[:, 3] * s,
                                 t[:, 4] * s, t[:, 5] * s], 1)
            val = valid

        # per-image affine; mosaic adds the random-window jitter (+-s/2)
        # standing in for the host mosaic's random centre
        keys = jax.random.split(k_aff, bs)
        jitter = s / 2.0 if mosaic else 0.0
        Ms, ss = jax.vmap(lambda k: _affine_matrix(
            k, src_hw, degrees, translate, scale, shear, border,
            window_jitter=jitter))(keys)
        if degrees == 0.0 and shear == 0.0:
            # M = [[sc,0,bx],[0,sc,by]] -> separable fast path
            out = jax.vmap(lambda im, M: _warp_scale_translate(
                im, M[0, 0], M[0, 2], M[1, 2], (s, s)))(canvas, Ms)
        else:
            M_invs = jnp.linalg.inv(Ms)
            out = jax.vmap(lambda im, mi: _warp(im, mi, (s, s)))(canvas,
                                                                 M_invs)

        # labels through their image's M
        img_i = tgt_pix[:, 0].astype(jnp.int32)
        M_t = Ms[jnp.clip(img_i, 0, bs - 1)]               # (N, 3, 3)
        s_t = ss[jnp.clip(img_i, 0, bs - 1)]
        x, y, w, h = tgt_pix[:, 2], tgt_pix[:, 3], tgt_pix[:, 4], tgt_pix[:, 5]
        xyxy = jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], 1)
        cxs = jnp.stack([xyxy[:, 0], xyxy[:, 2], xyxy[:, 0], xyxy[:, 2]], 1)
        cys = jnp.stack([xyxy[:, 1], xyxy[:, 3], xyxy[:, 3], xyxy[:, 1]], 1)
        px = (M_t[:, 0, 0:1] * cxs + M_t[:, 0, 1:2] * cys + M_t[:, 0, 2:3])
        py = (M_t[:, 1, 0:1] * cxs + M_t[:, 1, 1:2] * cys + M_t[:, 1, 2:3])
        bx1 = jnp.clip(px.min(1), 0, s)
        bx2 = jnp.clip(px.max(1), 0, s)
        by1 = jnp.clip(py.min(1), 0, s)
        by2 = jnp.clip(py.max(1), 0, s)
        nw, nh = bx2 - bx1, by2 - by1
        area = nw * nh
        area0 = w * h
        ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
        keep = (nw > 4) & (nh > 4) & \
               (area / (area0 * s_t + 1e-16) > 0.2) & (ar < 10)
        val = val & keep

        # hsv jitter (shared gains per batch like the reference's per-item
        # draw — one draw per step); skipped for grayscale inputs
        if (hgain or sgain or vgain) and out.shape[-1] == 3:
            out = hsv_jitter(out, k_hsv, hgain, sgain, vgain)

        # per-image lr flip
        if flip_lr:
            flips = jax.random.bernoulli(k_flip, 0.5, (bs,))
            out = jnp.where(flips[:, None, None, None],
                            out[:, :, ::-1, :], out)
            f_t = flips[jnp.clip(img_i, 0, bs - 1)]
            bx1, bx2 = (jnp.where(f_t, s - bx2, bx1),
                        jnp.where(f_t, s - bx1, bx2))

        # back to normalised xywh
        ncx = (bx1 + bx2) / 2 / s
        ncy = (by1 + by2) / 2 / s
        nww = (bx2 - bx1) / s
        nhh = (by2 - by1) / s
        new_t = jnp.stack([tgt_pix[:, 0], tgt_pix[:, 1], ncx, ncy, nww, nhh], 1)
        new_t = jnp.where(val[:, None], new_t, 0.0)

        if mosaic:
            # compact the 4T replicated rows back to the input capacity T so
            # the downstream loss keeps its shapes (valid rows first; same
            # truncation contract as host pad_targets)
            order = jnp.argsort(jnp.where(val, 0, 1), stable=True)[:T]
            new_t = new_t[order]
            val = val[order]
        return out, new_t, val

    return augment
