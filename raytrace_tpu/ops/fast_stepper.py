"""Fast XLA stepper: one-hot MXU table fetch + uniform-grid arithmetic.

Performance analysis on TPU v5e (see SURVEY.md section 7 risks; measured in
this repo's round-1 work):

* per-lane random table access ("gather") is scalar-serialized on TPU --
  ~3 ms per [400k] gather round regardless of packing, and Mosaic's
  ``tpu.dynamic_gather`` is even slower on this stack;
* a factorized one-hot matmul fetch runs on the MXU at ~0.3 ms per round:
  build ``onehot_x[B, 128]`` from the x-cell index (iota compare), matmul
  against the channel table ``Tx[128, ny*NCH]``, then contract the y rows
  with an elementwise one-hot -- XLA fuses the epilogue.

This stepper is numerically equivalent to :mod:`raytrace_tpu.ops.stepper`
(the exact-table variant) up to float32 ulp-level differences: cell indices
come from uniform-grid arithmetic instead of bisection and grid coordinates
are reconstructed as ``x0 + k*dx`` in f32. Those perturbations are the same
class as XLA's FMA contraction and wash out under the reference's norm-based
5e-6 golden gate (validated against the reference binary's computed images).

Requires uniform gain grids (the shipped production snapshots are uniform;
:mod:`raytrace_tpu.ops.stepper` handles the general case).

Channel layout in ``Tx[N, 128, ny_cells * NCH]`` (host f64 -> f32):
  0-3   bilinear coefficients of n:  a, b, c, d  with
        n0 = a + b*dxi + c*dyi + d*dxi*dyi   (expanded corner form)
  4-5   gx1, gxd   (d n/dx edge gradients: dndx = gx1 + dyi*gxd)
  6-7   gy1, gyd
  8-11  g0 corner values g1, g2, g3, g4 (bilinear like the reference)
  12-15 E0 corners (ASE only)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops.stepper import TraceResult, N_SUB
from raytrace_tpu.structures import RayGain

__all__ = ["FastTables", "pack_fast_tables", "trace_batch_fast", "is_uniform"]

#: micro-steps executed per inner while round (see fl_body)
FL_UNROLL = 2

#: when True, trace_batch_fast returns (result, {"l0": .., "fl": ..,
#: "steps": ..}) with the executed outer (cell-fetch) and inner (micro-step)
#: loop round counts plus the per-lane total micro-step counts [B] -- a
#: tuning diagnostic, not used in production paths (tools/steps_analysis.py)
DEBUG_COUNTERS = False

#: when additionally True, the counters include "rec": a list (per segment)
#: of [B, DEBUG_RMAX] i32 arrays with the per-lane micro-step count of each
#: outer (l0) round -- column r is l0 round r, so columns align across lanes
#: exactly as the pallas kernel's per-tile rounds do. This is the input for
#: the cell-boundary-sync cost model (tools/steps_analysis.py --cellsync):
#: the kernel's inner while syncs the tile at EVERY cell walk, so true tile
#: rounds are sum-over-l0-rounds of per-round maxima, not the per-segment
#: max of totals. Rounds past DEBUG_RMAX accumulate into the last column
#: (slightly underestimating sync cost for pathological >RMAX-cell rays).
DEBUG_RECORD = False
DEBUG_RMAX = 96

f32 = jnp.float32
XPAD = 128  # one-hot width; requires Nx-1 <= 128 x-cells


class FastTables(NamedTuple):
    """Device tables + hashable static geometry for the fast stepper."""

    # channel tables for segments 1..N-1 (index seg-1); segment 0 is never
    # read (the kernel always uses the high-energy-side segment)
    tx: jax.Array        # [N-1, XPAD, ny_cells*NCH] f32 (x-major)
    meta: tuple          # static: per-seg (x0, dxc, y0, dyc, nx, ny, absy, r4)
    nch: int
    ny_cells: int


def is_uniform(gains: list[RayGain], tol: float = 1e-9) -> bool:
    """Uniform x/y grid spacings on every segment (any width). The pallas
    backend handles all uniform grids (multi-slab lane tables for wide
    ones); this fast lax backend additionally needs Nx-1 <= XPAD -- see
    :func:`fits_fast`."""
    for g in gains:
        for grid in (np.asarray(g.x), np.asarray(g.y)):
            d = np.diff(grid)
            if np.ptp(d) > tol * np.abs(d).mean():
                return False
    return True


def fits_fast(gains: list[RayGain], tol: float = 1e-9) -> bool:
    """True when this backend's one-hot lane tables apply: uniform grids
    AND Nx-1 <= XPAD cells."""
    return is_uniform(gains, tol) and all(g.Nx - 1 <= XPAD for g in gains)


def pack_fast_tables(gains: list[RayGain], use_emis: bool) -> FastTables:
    """Host-precompute the channel tables (f64 -> one f32 rounding)."""
    N = len(gains)
    nch = 16 if use_emis else 12
    nyc = max(g.Ny - 1 for g in gains)
    tx = np.zeros((N, XPAD, nyc * nch), dtype=np.float32)
    meta = []
    if not fits_fast(gains):
        raise ValueError("fast stepper requires uniform gain grids with "
                         f"Nx-1 <= {XPAD}; use the exact (lax-exact) backend")
    for s, g in enumerate(gains):
        Nx, Ny = g.Nx, g.Ny
        x = np.asarray(g.x, np.float64)
        y = np.asarray(g.y, np.float64)
        dxc = float(np.diff(x).mean())
        dyc = float(np.diff(y).mean())
        n = np.asarray(g.n, np.float64).reshape(Ny, Nx)
        g0 = np.asarray(g.g0, np.float64).reshape(Ny, Nx)
        E0 = (np.asarray(g.E0, np.float64).reshape(Ny, Nx)
              if g.E0 is not None else np.zeros((Ny, Nx)))
        gx = (n[:, 1:] - n[:, :-1]) / np.diff(x)[None, :]
        gy = (n[1:, :] - n[:-1, :]) / np.diff(y)[:, None]

        def corners(t):
            return t[:-1, :-1], t[:-1, 1:], t[1:, :-1], t[1:, 1:]

        n1, n2, n3, n4 = corners(n)
        chans = [
            n1,                       # a
            n2 - n1,                  # b
            n3 - n1,                  # c
            n4 - n3 - n2 + n1,        # d
            gx[:-1, :], gx[1:, :] - gx[:-1, :],
            gy[:, :-1], gy[:, 1:] - gy[:, :-1],
        ]
        chans += list(corners(g0))
        if use_emis:
            chans += list(corners(E0))
        if s >= 1:
            for c, t in enumerate(chans):
                # t: [Ny-1, Nx-1] -> tx[s-1, x, j*nch + c]
                tx[s - 1, : Nx - 1, c::nch][:, : Ny - 1] = t.T.astype(np.float32)
        r0, r1 = np.float32(x[0]), np.float32(x[-1])
        r2, r3 = np.float32(y[0]), np.float32(y[-1])
        absy = bool(r2 >= 0)
        if absy:
            r2 = np.float32(-r3)
        meta.append((float(x[0]), dxc, float(y[0]), dyc, Nx, Ny, absy,
                     (float(r0), float(r1), float(r2), float(r3))))
    return FastTables(tx=jnp.asarray(tx), meta=tuple(meta), nch=nch,
                      ny_cells=nyc)


def _segment_walk_fast(seg_idx: int, ft: FastTables, st0, dz0: float,
                       c: float, use_emis: bool, method: int):
    """Batched cell-walk over one whole segment: all three sub-lengths run
    inside a single while loop with a per-lane sub-length counter ``iz``.

    The per-sub loops share the segment's tables and constants; merging them
    means each lane advances through its sub-lengths at its own pace, so the
    loop runs ~max(total cells per lane in the segment) rounds instead of
    the sum of per-sub batch maxima.
    """
    x0_, dxc_, y0_, dyc_, nx_t, ny_t, absy, r4 = ft.meta[seg_idx]
    x0 = f32(np.float32(x0_))
    dxc = f32(np.float32(dxc_))
    inv_dx = f32(np.float32(1.0) / np.float32(dxc_))
    y0 = f32(np.float32(y0_))
    dyc = f32(np.float32(dyc_))
    inv_dy = f32(np.float32(1.0) / np.float32(dyc_))
    r0, r1, r2, r3 = (f32(np.float32(v)) for v in r4)
    nch = ft.nch
    nyc = ft.ny_cells
    tx = ft.tx[seg_idx - 1]  # [XPAD, nyc*nch] (segment-1-based)
    # per-sub stop distances, f32-rounded exactly like the reference's
    # dz0*(iz+1.0f)/N_SUB (RayTraceImageHelper.h:462)
    zs_c = [f32(np.float32(np.float32(dz0) * np.float32(iz + 1.0)
                           / np.float32(N_SUB))) for iz in range(N_SUB)]

    def zs_of(iz):
        return jnp.where(iz <= 0, zs_c[0], jnp.where(iz == 1, zs_c[1], zs_c[2]))

    def isub_of(iz):
        return (jnp.int32(N_SUB - 1) - iz) if method == 1 else iz

    def flush(st_out, mask, isub, cur, key):
        out = list(st_out)
        for s in range(N_SUB):
            out[s] = jnp.where(mask & (isub == s), cur, out[s])
        return tuple(out)

    def l0_cond(st):
        return jnp.any(~(st["esc"] | (st["iz"] >= N_SUB)))

    def l0_body(st):
        p_x, p_y = st["px"], st["py"]
        s_x, s_y, s_z = st["sx"], st["sy"], st["sz"]
        act0 = ~(st["esc"] | (st["iz"] >= N_SUB))
        n_l0 = st["n_l0"] + 1 if "n_l0" in st else None
        # ---- sub-length advance: z passed 0.995*z_stop(iz) ---------------
        iz = st["iz"]
        adv = act0 & (st["z"] >= f32(0.995) * zs_of(iz))
        isub = isub_of(iz)
        out_g = flush(st["out_g"], adv, isub, st["gvl"], "g")
        out_e = flush(st["out_e"], adv, isub, st["evl"], "e")
        out_i = flush(st["out_i"], adv, isub, st["ivl"], "i")
        gvl_cur = jnp.where(adv, f32(0.0), st["gvl"])
        evl_cur = jnp.where(adv, f32(0.0), st["evl"])
        ivl_cur = jnp.where(adv, jnp.int32(0), st["ivl"])
        iz = iz + adv.astype(jnp.int32)
        act = act0 & (iz < N_SUB)
        zs = zs_of(iz)
        isub = isub_of(iz)

        esc_now = act & ((p_x < r0) | (p_x > r1) | (p_y < r2) | (p_y > r3)
                         | (s_z * s_z < f32(0.01)))
        # escaping lanes flush their partial sums for the current sub-length
        # (the reference accumulates straight into gvl[ii-1][is], so partials
        # up to the escape are kept, RayTraceImageHelper.h:501-503)
        out_g = flush(out_g, esc_now, isub, gvl_cur, "g")
        out_e = flush(out_e, esc_now, isub, evl_cur, "e")
        out_i = flush(out_i, esc_now, isub, ivl_cur, "i")
        esc = st["esc"] | esc_now
        work = act & ~esc_now

        y_eff = jnp.where(absy, jnp.abs(p_y), p_y)
        qx = (p_x - x0) * inv_dx
        qy = (y_eff - y0) * inv_dy
        k1m1 = jnp.clip(jnp.ceil(qx).astype(jnp.int32) - 1, 0, nx_t - 2)
        k2m1 = jnp.clip(jnp.ceil(qy).astype(jnp.int32) - 1, 0, ny_t - 2)

        # ---- one-hot MXU fetch of all cell channels -----------------------
        B = p_x.shape[0]
        oh_x = (jax.lax.broadcasted_iota(jnp.int32, (B, XPAD), 1)
                == k1m1[:, None]).astype(jnp.float32)
        # Precision.HIGHEST: the default f32 matmul runs in bf16 on the MXU,
        # which would round the fetched table values (~1e-3 relative); the
        # one-hot fetch must return exact f32 channel values
        M = jax.lax.dot_general(oh_x, tx, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        M = M.reshape(B, nyc, nch)
        oh_y = (jax.lax.broadcasted_iota(jnp.int32, (B, nyc), 1)
                == k2m1[:, None]).astype(jnp.float32)
        vals = jnp.sum(M * oh_y[:, :, None], axis=1)  # [B, nch]
        na_, nb_, nc_, nd_ = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
        gx1, gxd = vals[:, 4], vals[:, 5]
        gy1, gyd = vals[:, 6], vals[:, 7]

        xlo = x0 + k1m1.astype(f32) * dxc
        ylo = y0 + k2m1.astype(f32) * dyc
        dxi = (p_x - xlo) * inv_dx
        dyi = (y_eff - ylo) * inv_dy
        one = f32(1.0)
        g0c = ((dxi * vals[:, 9] + (one - dxi) * vals[:, 8]) * (one - dyi)
               + (dxi * vals[:, 11] + (one - dxi) * vals[:, 10]) * dyi)
        if use_emis:
            E0c = ((dxi * vals[:, 13] + (one - dxi) * vals[:, 12]) * (one - dyi)
                   + (dxi * vals[:, 15] + (one - dxi) * vals[:, 14]) * dyi)
            E0c = jnp.maximum(E0c, f32(0.0))
        else:
            E0c = jnp.zeros_like(g0c)

        exlo = xlo - f32(0.1) * dxc
        exhi = xlo + dxc + f32(0.1) * dxc
        eyhi = ylo + dyc + f32(0.1) * dyc
        eylo = jnp.where(absy & (k2m1 <= 0), -eyhi, ylo - f32(0.1) * dyc) \
            if absy else (ylo - f32(0.1) * dyc)
        dz2 = zs - st["z"]

        # ---- flattened in-cell walk: the reference's propagate2/propagate
        # nest (one re-interpolation per multi-micro-step propagate call)
        # becomes a single while loop taking ONE micro-step per iteration,
        # with the per-propagate-call cached state (n0, gradients, the step
        # box and displacement r) carried per lane. Nesting the batched
        # loops would cost max(interp-trips) * max(micro-trips) rounds; the
        # flattened form costs max(total micro-steps), which is far smaller
        # under divergence. Per-lane step sequences are identical.
        box0 = f32(0.1) * dxc
        box1 = f32(0.1) * dyc
        half = f32(0.5)
        one = f32(1.0)

        def interp_cell(px_, py_, z2_):
            """propagate2's per-call re-interpolation + propagate init."""
            y2 = jnp.where(absy, jnp.abs(py_), py_) if absy else py_
            dxi2 = (px_ - xlo) * inv_dx
            dyi2 = (y2 - ylo) * inv_dy
            n0 = na_ + nb_ * dxi2 + nc_ * dyi2 + nd_ * dxi2 * dyi2
            dndx = gx1 + dyi2 * gxd
            dndy = gy1 + dxi2 * gyd
            if absy:
                dndy = jnp.where(py_ < 0, -dndy, dndy)
            box2 = dz2 - z2_
            return n0, dndx, dndy, box2

        def fl_cond(s1):
            return jnp.any(s1["act"])

        def fl_one_step(s1):
            a1 = s1["act"]
            # one adaptive micro-step (propagate body,
            # RayTraceImageHelper.h:279-311)
            n0, dndx, dndy = s1["n0"], s1["dndx"], s1["dndy"]
            box2 = s1["box2"]
            n = n0 + s1["rx"] * dndx + s1["ry"] * dndy
            # shared reciprocal + constant-reciprocal multiplies below:
            # <= 1 ulp vs the plain divides, and MUST stay expression-for-
            # expression identical to ops/pallas_kernel.fl_one_step (the
            # per-lane micro-step sequences are lockstep-tested)
            invn = f32(1.0) / n
            t = (s1["sx"] * dndx + s1["sy"] * dndy + f32(1e-12)) * invn
            fx = dndx * invn - s1["sx"] * t
            fy = dndy * invn - s1["sy"] * t
            fz = -s1["sz"] * t
            step = f32(c) * f32(0.1) / jnp.abs(t)
            step = jnp.minimum(step, f32(c) * f32(1.00001) * box2)
            step2 = f32(1.0001) * (box2 - jnp.abs(s1["rz"])) / jnp.abs(s1["sz"])
            step3 = f32(c) * f32(0.05) * (jnp.abs(s1["sx"]) + f32(5e-4)) \
                / (jnp.abs(fx) + f32(1e-8))
            step4 = f32(c) * f32(0.05) * (jnp.abs(s1["sy"]) + f32(5e-4)) \
                / (jnp.abs(fy) + f32(1e-8))
            step = jnp.minimum(jnp.minimum(step, step2),
                               jnp.minimum(step3, step4))
            st_ = step * t
            c1 = half * step * step * (one - st_ * f32(1.0 / 3.0)
                                       + (st_ * st_) * f32(1.0 / 12.0))
            rx = s1["rx"] + s1["sx"] * step + c1 * fx
            ry = s1["ry"] + s1["sy"] * step + c1 * fy
            rz = s1["rz"] + s1["sz"] * step + c1 * fz
            c2 = step * (one - half * st_ + (st_ * st_) * f32(1.0 / 6.0))
            ux = s1["sx"] + c2 * fx
            uy = s1["sy"] + c2 * fy
            uz = s1["sz"] + c2 * fz
            inv = jax.lax.rsqrt(ux * ux + uy * uy + uz * uz)
            ux, uy, uz = ux * inv, uy * inv, uz * inv
            path = s1["path"] + step
            n_lag = n

            sel = lambda p, q: jnp.where(a1, p, q)
            rx = sel(rx, s1["rx"])
            ry = sel(ry, s1["ry"])
            rz = sel(rz, s1["rz"])
            ux = sel(ux, s1["sx"])
            uy = sel(uy, s1["sy"])
            uz = sel(uz, s1["sz"])
            path = sel(path, s1["path"])
            n_lag = sel(n_lag, s1["n_lag"])

            # propagate-exit test (the lagged-n drift check matches the
            # reference's loop structure)
            l2_ok = ((jnp.abs(rx) < box0) & (jnp.abs(ry) < box1)
                     & (jnp.abs(rz) < box2)
                     & (jnp.abs(n_lag - n0) < f32(0.05)))
            commit = a1 & ~l2_ok
            # commit the propagate call: pos += r, z2 += |rz|, ds += path
            csel = lambda p, q: jnp.where(commit, p, q)
            px_ = csel(s1["px"] + rx, s1["px"])
            py_ = csel(s1["py"] + ry, s1["py"])
            pz_ = csel(s1["pz"] + rz, s1["pz"])
            z2_ = csel(s1["z2"] + jnp.abs(rz), s1["z2"])
            ds_ = csel(s1["ds"] + path, s1["ds"])
            # propagate2 loop condition on the committed state
            y2n = jnp.where(absy, jnp.abs(py_), py_) if absy else py_
            l1_ok = ((px_ > exlo) & (px_ < exhi) & (y2n > eylo)
                     & (y2n < eyhi) & (z2_ < f32(0.999) * dz2))
            reinit = commit & l1_ok
            n0n, dndxn, dndyn, box2n = interp_cell(px_, py_, z2_)
            rsel = lambda p, q: jnp.where(reinit, p, q)
            zero = jnp.zeros_like(px_)
            return {
                "px": px_, "py": py_, "pz": pz_,
                "sx": ux, "sy": uy, "sz": uz,
                "z2": z2_, "ds": ds_,
                "rx": rsel(zero, rx), "ry": rsel(zero, ry),
                "rz": rsel(zero, rz), "path": rsel(zero, path),
                "n0": rsel(n0n, n0), "dndx": rsel(dndxn, dndx),
                "dndy": rsel(dndyn, dndy), "box2": rsel(box2n, box2),
                "n_lag": rsel(n0n, n_lag),
                "act": a1 & (l2_ok | reinit),
                **({"n_act": s1["n_act"] + a1.astype(jnp.int32)}
                   if "n_act" in s1 else {}),
            }

        def fl_body(s1):
            # several micro-steps per while round: the loop is bounded by a
            # small tail of slow rays (near-axis rays with strong transverse
            # gradients take hundreds of micro-steps), so per-round overhead
            # dominates; unrolling trades masked idle work for rounds
            counting = "n_fl" in s1
            if counting:
                s1 = dict(s1)
                n_fl_new = s1.pop("n_fl") + 1
            for _ in range(FL_UNROLL):
                s1 = fl_one_step(s1)
            if counting:
                s1["n_fl"] = n_fl_new
            return s1

        zero = jnp.zeros_like(p_x)
        y20 = jnp.where(absy, jnp.abs(p_y), p_y) if absy else p_y
        l1a0 = work & ((p_x > exlo) & (p_x < exhi) & (y20 > eylo)
                       & (y20 < eyhi) & (zero < f32(0.999) * dz2))
        n0_0, dndx_0, dndy_0, box2_0 = interp_cell(p_x, p_y, zero)
        fl_init = {
            "px": p_x, "py": p_y, "pz": zero, "sx": s_x, "sy": s_y,
            "sz": s_z, "z2": zero, "ds": zero,
            "rx": zero, "ry": zero, "rz": zero, "path": zero,
            "n0": n0_0, "dndx": dndx_0, "dndy": dndy_0, "box2": box2_0,
            "n_lag": n0_0, "act": l1a0}
        if n_l0 is not None:
            fl_init["n_fl"] = jnp.int32(0)
            fl_init["n_act"] = st["n_steps"]  # per-lane, carried across segs
        l1 = jax.lax.while_loop(fl_cond, fl_body, fl_init)

        sel = lambda p, q: jnp.where(work, p, q)
        nz = sel(st["z"] + jnp.abs(l1["pz"]), st["z"])
        i1 = k1m1 + k2m1 * nx_t
        ret = {
            "px": sel(l1["px"], p_x), "py": sel(l1["py"], p_y),
            "sx": sel(l1["sx"], s_x), "sy": sel(l1["sy"], s_y),
            "sz": sel(l1["sz"], s_z), "z": nz, "esc": esc, "iz": iz,
            "gvl": sel(gvl_cur + g0c * l1["ds"], gvl_cur),
            "evl": sel(evl_cur + E0c * l1["ds"], evl_cur),
            "ivl": jnp.where(work, i1, ivl_cur),
            "out_g": out_g, "out_e": out_e, "out_i": out_i,
        }
        if n_l0 is not None:
            ret["n_l0"] = n_l0
            ret["n_fl"] = st["n_fl"] + l1["n_fl"]
            ret["n_steps"] = l1["n_act"]
            if "rec" in st:
                # per-lane steps taken in THIS l0 round, scattered into
                # column r (one-hot; rounds >= RMAX fold into the last).
                # Encoded as steps+1 for participating (work) lanes so a
                # 0-step fetch-only round is distinguishable from absence:
                # decode steps = max(rec-1, 0), participated = rec > 0.
                stepped = l1["n_act"] - st["n_steps"]
                enc = jnp.where(work, stepped + 1, 0)
                col = jnp.minimum(st["n_l0"], jnp.int32(DEBUG_RMAX - 1))
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, DEBUG_RMAX), 1) == col)
                ret["rec"] = st["rec"] + onehot * enc[:, None]
        return ret

    return jax.lax.while_loop(l0_cond, l0_body, dict(st0))


def trace_batch_fast(rays, N: int, dz0: float, ft: FastTables, method: int,
                     c: float = 0.5, use_emis: bool = True) -> TraceResult:
    """Drop-in replacement for stepper.trace_batch on uniform grids."""
    B = rays["x"].shape[0]
    nseg = max(N - 1, 0)
    px = rays["x"].astype(jnp.float32)
    py = rays["y"].astype(jnp.float32)
    sx = jnp.tan((f32(1e-3) * rays["a"].astype(jnp.float32))
                 .astype(jnp.float64)).astype(jnp.float32)
    sy = jnp.tan((f32(1e-3) * rays["b"].astype(jnp.float32))
                 .astype(jnp.float64)).astype(jnp.float32)
    sz = jnp.full((B,), f32(1.0))
    if method == 1:
        sx, sy, sz = -sx, -sy, -sz
    inv = f32(1.0) / jnp.sqrt(sx * sx + sy * sy + sz * sz)
    sx, sy, sz = sx * inv, sy * inv, sz * inv
    escaped = jnp.zeros((B,), dtype=bool)

    gvl_all = jnp.zeros((B, max(nseg, 1), N_SUB), dtype=jnp.float32)
    evl_all = jnp.zeros((B, max(nseg, 1), N_SUB), dtype=jnp.float32)
    ivl_all = jnp.zeros((B, max(nseg, 1), N_SUB), dtype=jnp.int32)

    zerosf = jnp.zeros((B,), jnp.float32)
    zerosi = jnp.zeros((B,), jnp.int32)
    _counters = {}
    for i in range(nseg):
        ii = N - i - 1 if method == 1 else i + 1
        st = {
            "px": px, "py": py, "sx": sx, "sy": sy, "sz": sz,
            "z": zerosf, "esc": escaped, "iz": zerosi,
            "gvl": zerosf, "evl": zerosf, "ivl": zerosi,
            "out_g": (zerosf,) * N_SUB,
            "out_e": (zerosf,) * N_SUB,
            "out_i": (zerosi,) * N_SUB,
        }
        if DEBUG_COUNTERS:
            st["n_l0"] = jnp.int32(0)
            st["n_fl"] = jnp.int32(0)
            st["n_steps"] = _counters.get("steps", zerosi)
            if DEBUG_RECORD:
                st["rec"] = jnp.zeros((B, DEBUG_RMAX), jnp.int32)
        st = _segment_walk_fast(ii, ft, st, dz0, c, use_emis, method)
        if DEBUG_COUNTERS:
            _counters["l0"] = _counters.get("l0", 0) + st["n_l0"]
            _counters["fl"] = _counters.get("fl", 0) + st["n_fl"]
            _counters["steps"] = st["n_steps"]
            if DEBUG_RECORD:
                _counters.setdefault("rec", []).append(st["rec"])
            # cumulative per-lane counts after each segment: per-segment
            # counts are diffs (the pallas kernel's per-tile cost model is
            # sum over segments of the tile's max, tools/steps_analysis.py)
            _counters.setdefault("steps_cum", []).append(st["n_steps"])
        for s in range(N_SUB):
            gvl_all = gvl_all.at[:, ii - 1, s].set(st["out_g"][s])
            evl_all = evl_all.at[:, ii - 1, s].set(st["out_e"][s])
            ivl_all = ivl_all.at[:, ii - 1, s].set(st["out_i"][s])
        px, py = st["px"], st["py"]
        sx, sy, sz = st["sx"], st["sy"], st["sz"]
        escaped = st["esc"]

    perp = sz * sz < f32(0.01)
    exit_a = (jnp.arctan((sx / sz).astype(jnp.float64)).astype(jnp.float32)
              * f32(1e3))
    exit_b = (jnp.arctan((sy / sz).astype(jnp.float64)).astype(jnp.float32)
              * f32(1e3))
    result = TraceResult(gvl=gvl_all, evl=evl_all, ivl=ivl_all,
                         exit_x=px, exit_y=py, exit_a=exit_a, exit_b=exit_b,
                         escaped=escaped, perp=perp)
    if DEBUG_COUNTERS:
        return result, dict(_counters)
    return result
