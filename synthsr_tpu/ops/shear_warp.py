"""Gather-free affine warps via exact shear factorization + masked shifts.

TPU has no hardware gather: the 8-corner trilinear warp of ``ops/interp.py``
lowers to per-element dynamic-slices and measured ~137 ms for one 128-cubed
linear warp — the registration-error simulation's THREE such warps dominate
the whole synth-train step (~410 of ~950 ms).  This module removes the
gathers for the AFFINE case:

- **Coordinate factorization (exact).**  A near-identity affine map
  ``q(p) = N p + u`` factors into three per-axis shear passes
  x-pass -> y-pass -> z-pass, each resampling along ONE axis at an affine
  scalar field of the output coordinates.  The fields are derived in closed
  form (``_shear_fields``) so the COMPOSED coordinates equal ``q(p)``
  exactly — this is the classic multi-shear rotation decomposition
  generalized to any invertible affine with nonzero leading minors (always
  true for the small rotations/translations of the acquisition pipeline).

- **Masked static shifts (no gathers).**  A 1-D linear resample at an
  affine coordinate field ``g`` touches input index ``floor(g)`` and
  ``floor(g)+1`` with bounded displacement ``|g - coord| <= R`` (R is a
  STATIC bound from the augmentation bounds, ``static_max_disp``).  The
  pass is therefore a sum of 2R+3 STATICALLY shifted copies of the volume
  weighted by elementwise masks — pure VPU/fusion work, zero gathers:
  ``out = sum_s [(1-f)·[lo==s] + f·[lo==s+1... see _axis_resample]``.

Deviation from the reference (documented, same class as the accepted
clip-SVF deviation): the three passes apply SEPARABLE per-axis linear
interpolation along the exact shear coordinates instead of joint trilinear
interpolation at ``q(p)`` (reference ``neuron/utils.py:25-124`` semantics,
repo twin ``ops/interp.py:interpn``).  Sampled coordinates are identical;
only the interpolation stencil differs, by O(second differences) on smooth
data — the acquisition channels are Gaussian-blurred before these warps.
Out-of-range coordinates edge-replicate per pass (the reference clips the
joint coordinate; differences are confined to edge voxels).  Callers that
need reference-exact trilinear keep ``ops/interp.transform`` (opt-in via
``exact_warp`` in the generation config).

Used by synth/labels_to_image.py for the registration-error warps
(reference SynthSR/labels_to_image_model.py:201-238).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _as_n_u(affine, shape):
    """q(p) = N p + u from a (3,4)/(4,4) affine applied about the volume
    centre (the ``ops/interp.affine_to_shift`` convention: q = A (p-c) + c
    with the translation inside A's last column)."""
    affine = affine.astype(jnp.float32)
    if affine.shape[-2:] == (4, 4):
        affine = affine[:3]
    n = affine[:, :3]
    t = affine[:, 3]
    c = jnp.asarray([(s - 1) / 2.0 for s in shape], jnp.float32)
    u = t + c - n @ c
    return n, u


def _shear_fields(n, u):
    """Affine coefficient rows (a_i, a_j, a_k, const) of the three pass
    fields gx, gy, gz such that composing
        t1[i,j,k] = in (gx(i,j,k), j, k)       (x-pass)
        t2[i,j,k] = t1(i, gy(i,j,k), k)        (y-pass)
        out[i,j,k] = t2(i, j, gz(i,j,k))       (z-pass)
    samples ``in`` at exactly q(p) = N p + u.  Requires N33 != 0 and the
    Schur complement b2 = N22 - N23 N32 / N33 != 0 (holds for all
    near-identity affines of the augmentation pipeline)."""
    # z-pass: gz = qz directly (evaluated at output coords)
    gz = (n[2, 0], n[2, 1], n[2, 2], u[2])
    # y-pass sees (i, j, k') with k' = qz(p); eliminate k via the qz solve
    a2 = n[1, 0] - n[1, 2] * n[2, 0] / n[2, 2]
    b2 = n[1, 1] - n[1, 2] * n[2, 1] / n[2, 2]
    c2 = n[1, 2] / n[2, 2]
    d2 = u[1] - n[1, 2] * u[2] / n[2, 2]
    gy = (a2, b2, c2, d2)
    # x-pass sees (i, j', k') with j' = gy(i, j, k'); invert for j, then k
    aj, bj, cj, dj = -a2 / b2, 1.0 / b2, -c2 / b2, -d2 / b2   # j(i, j', k')
    ak = (-n[2, 0] - n[2, 1] * aj) / n[2, 2]                  # k(i, j', k')
    bk = (-n[2, 1] * bj) / n[2, 2]
    ck = (1.0 - n[2, 1] * cj) / n[2, 2]
    dk = (-u[2] - n[2, 1] * dj) / n[2, 2]
    gx = (n[0, 0] + n[0, 1] * aj + n[0, 2] * ak,
          n[0, 1] * bj + n[0, 2] * bk,
          n[0, 1] * cj + n[0, 2] * ck,
          n[0, 1] * dj + n[0, 2] * dk + u[0])
    return gx, gy, gz


def _axis_resample(vol, coef, axis, r):
    """1-D linear resample of ``vol`` (X, Y, Z, C) along ``axis`` at the
    affine coordinate field g = ai·i + aj·j + ak·k + c, as 2r+2 masked
    static shifts (edge-replicate outside [0, S-1])."""
    ai, aj, ak, const = coef
    x, y, z = vol.shape[:3]
    s_ax = vol.shape[axis]
    ii = jax.lax.broadcasted_iota(jnp.float32, (x, y, z), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (x, y, z), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (x, y, z), 2)
    g = ai * ii + aj * jj + ak * kk + const
    g = jnp.clip(g, 0.0, s_ax - 1.0)               # edge replicate
    coord = (ii, jj, kk)[axis]
    off = g - coord                                 # |off| <= r by bound
    off = jnp.clip(off, -r, r)                      # static-range safety
    lo = jnp.floor(off)
    f = (off - lo)[..., None]
    lo = lo.astype(jnp.int32)

    pad = [(0, 0)] * 4
    pad[axis] = (r + 1, r + 1)
    vp = jnp.pad(vol, pad, mode="edge")

    def shifted(s):
        idx = [slice(None)] * 4
        idx[axis] = slice(r + 1 + s, r + 1 + s + s_ax)
        return vp[tuple(idx)]

    out = jnp.zeros_like(vol)
    for s in range(-r, r + 2):
        # weight of the copy shifted by s: low corner when lo == s,
        # high corner when lo == s - 1
        w = jnp.where((lo == s)[..., None], 1.0 - f,
                      jnp.where((lo == s - 1)[..., None], f, 0.0))
        out = out + w * shifted(s)
    return out


def shear_warp_affine(vol, affine, max_disp):
    """Warp ``vol`` (X, Y, Z, C) by the affine ``q(p) = A (p - c) + c``
    (A: (3,4) or (4,4) with translation in the last column — the matrix
    convention of ``ops/interp.affine_to_shift``) via three gather-free
    shear passes.  ``max_disp``: static int bound on per-axis displacement
    (use ``static_max_disp``)."""
    r = int(max_disp)
    shape = vol.shape[:3]
    n, u = _as_n_u(affine, shape)
    gx, gy, gz = _shear_fields(n, u)
    t1 = _axis_resample(vol, gx, 0, r)
    t2 = _axis_resample(t1, gy, 1, r)
    return _axis_resample(t2, gz, 2, r)


def static_max_disp(shape, rotation_bounds=0.0, translation_bounds=0.0,
                    scaling_bounds=0.0, shearing_bounds=0.0, margin=2):
    """STATIC per-axis displacement bound for the shear fields of any affine
    drawn within the given ``sample_affine_matrix`` bounds, by exhaustive
    corner sweep (all bound-extreme rotations/scales/shears/translations,
    evaluated at the volume corners) — conservative via the added margin
    (the runtime clamp in ``_axis_resample`` makes overshoot safe)."""
    import itertools

    shape = [float(s) for s in shape]
    c = np.array([(s - 1) / 2.0 for s in shape])
    rb = float(rotation_bounds or 0.0)
    tb = float(translation_bounds or 0.0)
    sb = float(scaling_bounds or 0.0)
    hb = float(shearing_bounds or 0.0)
    # translation enters each pass field with total coefficient <= ~1.2 for
    # near-identity affines (1 direct + the small cross-elimination terms);
    # sweep with zero translation and add a 1.5x margin for it
    worst = 0.0
    rot_vals = [-rb, 0.0, rb] if rb else [0.0]
    sc_vals = [1.0 - sb, 1.0 + sb] if sb else [1.0]
    sh_vals = [-hb, hb] if hb else [0.0]
    for rx, ry, rz in itertools.product(rot_vals, repeat=3):
        rads = np.radians([rx, ry, rz])
        cz, sz = np.cos(rads[2]), np.sin(rads[2])
        cy, sy = np.cos(rads[1]), np.sin(rads[1])
        cx, sx = np.cos(rads[0]), np.sin(rads[0])
        rmx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        rmy = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rmz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        for scale in sc_vals:
            for sh in sh_vals:
                t_shear = np.eye(3) + sh * (np.ones((3, 3)) - np.eye(3))
                nmat = (scale * np.eye(3)) @ t_shear @ (rmx @ rmy @ rmz)
                umat = c - nmat @ c
                # field coefficient rows via the same factorization
                neye = nmat
                fields = []
                a2 = neye[1, 0] - neye[1, 2] * neye[2, 0] / neye[2, 2]
                b2 = neye[1, 1] - neye[1, 2] * neye[2, 1] / neye[2, 2]
                c2 = neye[1, 2] / neye[2, 2]
                d2 = umat[1] - neye[1, 2] * umat[2] / neye[2, 2]
                aj, bj, cj, dj = -a2 / b2, 1.0 / b2, -c2 / b2, -d2 / b2
                ak = (-neye[2, 0] - neye[2, 1] * aj) / neye[2, 2]
                bk = (-neye[2, 1] * bj) / neye[2, 2]
                ck = (1.0 - neye[2, 1] * cj) / neye[2, 2]
                dk = (-umat[2] - neye[2, 1] * dj) / neye[2, 2]
                fields.append(((neye[0, 0] + neye[0, 1] * aj + neye[0, 2] * ak,
                                neye[0, 1] * bj + neye[0, 2] * bk,
                                neye[0, 1] * cj + neye[0, 2] * ck,
                                neye[0, 1] * dj + neye[0, 2] * dk + umat[0]),
                               0))
                fields.append(((a2, b2, c2, d2), 1))
                fields.append(((neye[2, 0], neye[2, 1], neye[2, 2], umat[2]),
                               2))
                for (fa, fb, fc, fd), ax in fields:
                    for corner in itertools.product(*[(0.0, s - 1)
                                                      for s in shape]):
                        g = (fa * corner[0] + fb * corner[1]
                             + fc * corner[2] + fd)
                        worst = max(worst, abs(g - corner[ax]))
    return int(np.ceil(worst + 1.5 * tb)) + int(margin)
