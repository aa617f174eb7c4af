"""The enhanced (feature-scored) merge loop as ONE Pallas kernel launch.

Round-1 found the chip is time-shared at kernel granularity: an XLA
``lax.while_loop`` step of the enhanced loop is ~30 fused kernels, each paying
dispatch latency (4.7 us quiet, ~300 us contended) — the flagship loop ran at
6.6k merges/s while the fused distance-only kernel (merge_loop.py) sustained
27k steps/s. This kernel runs a whole SEGMENT of enhanced steps (queue
consumption, dense-channel scoring, batched merges, bookkeeping, threshold and
phase control) inside a single ``pallas_call``, following merge_loop.py's
layout: per-token state VMEM-resident as ``(max_V/128, 128)`` lane-major
arrays, embeddings in HBM streamed per fold, scalars in SMEM.

Semantics: exactly ``enhanced_state.enhanced_step`` (see that module), with
the work that cannot live in a kernel kept in XLA at segment boundaries:

  * ``sync_corpus`` (corpus replay, pair table, scoring, queue build),
  * the adaptive-curvature Adam step (autodiff) — the kernel HALTS when
    ``num_merges`` reaches the next curvature event and the XLA wrapper
    (enhanced_state.run_enhanced) updates curvature and relaunches,
  * per-chunk coherence sampling (sample embeddings enter as a VMEM block).

Matches the reference flagship loop enhanced_fast_hyperbolic_merge.py
:1015-1209. Numerics caveat as merge_loop.py: lane-tree reductions vs the XLA
path's matmul reductions agree to fp32 noise; merge sequences can differ only
on exact score/distance ties.

Corpus-only (bpe) mode skips best_dist/best_j maintenance entirely — the
dense channel never reads them, and skipping the per-batch O(V d) fold is
most of this kernel's speed advantage in that mode. The invariant is
STRUCTURAL since round 4: corpus-only states are built with the arrays
POISONED (-inf/-1, MergeConfig.init_candidates=False) and
enhanced_state.run_enhanced raises if a dense-channel config ever meets a
poisoned state (VERDICT r3 #7); core.load rebuilds candidates with a full
re-scan for loaded artifacts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyptokenizer_tpu.ops.lorentz import ACOSH_EPS, EPS_NORM, EXP_ZERO_TOL
from hyptokenizer_tpu.ops.pallas.merge_loop import (
    _acosh, _get, _lane_iota, _pick_group, _set,
)
from hyptokenizer_tpu.tokenizer.scoring import HASH_P1, HASH_P2

INF = jnp.inf
IMAX = 2**31 - 1
LANES = 128
GRAD_EPS = 1e-6  # enhanced_state.GRAD_EPS (coherence distance clamp)
THRESHOLD_CAP = 1e6

# SMEM integer slots
SI = dict(vocab=0, nm=1, step=2, empty=3, stopped=4, phase=5, resync=6,
          synced=7, m_budget=8, s_budget=9, curv_stop=10, morph_size=11,
          word_size=12, corpus_tokens=13, qv1=14, qv2=15, qv3=16, halt=17)
NSI = 18
# SMEM float slots
SF = dict(thr=0, c=1, maxcnt=2)
NSF = 3


def _get_at(ref, idx, base_row=0):
    """Scalar read of flat element ``idx`` from (base_row +) a lane-major
    (N, 128) region of ``ref``.

    Sum-extraction over the masked row (exactly one lane survives), NOT a
    max: this must stay legal for int32 refs — Mosaic lowers no unsigned
    reductions at all, which is why every key/hash table in this kernel is
    int32 (KERNELS.md; VERDICT r2 #1).
    """
    row = ref[pl.ds(base_row + idx // LANES, 1), :]
    return jnp.sum(jnp.where(_lane_iota() == idx % LANES, row,
                             jnp.zeros_like(row)))


def _searchsorted2(hi_ref, lo_ref, qh, ql, n):
    """Lexicographic searchsorted of ONE (qh, ql) key over two (N/128, 128)
    lane-major sorted int32 refs; scalar binary search, log2(n) rounds."""
    lo = jnp.int32(0)
    hi = jnp.int32(n)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mh = _get_at(hi_ref, mid)
        ml = _get_at(lo_ref, mid)
        lt = (mh < qh) | ((mh == qh) & (ml < ql))
        return jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid)

    lo, _ = jax.lax.fori_loop(0, max(int(n), 1).bit_length(), body, (lo, hi))
    return lo


def _in_sorted_i32(ref, key, size, n):
    """Membership of one int32 key in a sorted (N/128, 128) padded table."""
    lo = jnp.int32(0)
    hi = jnp.int32(n)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mv = _get_at(ref, mid)
        lt = mv < key
        return jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid)

    lo, _ = jax.lax.fori_loop(0, max(int(n), 1).bit_length(), body, (lo, hi))
    pos = jnp.minimum(lo, n - 1)
    return (_get_at(ref, pos) == key) & (lo < size)


def _midpoint(xi, xj, li, lj, lane, d1):
    """Weighted geodesic midpoint — ops/lorentz.geodesic_point, the
    cancellation-free evaluation of exp_map(xi, w * log_map(xi, xj))."""
    sig = jnp.where(lane == 0, 1.0, jnp.where(lane < d1, -1.0, 0.0))
    m_raw = jnp.sum(sig * xi * xj)
    m_c = jnp.maximum(m_raw, 1.0 + ACOSH_EPS)
    d = _acosh(m_c)
    w = lj.astype(jnp.float32) / jnp.maximum(li + lj, 1).astype(jnp.float32)
    a = (1.0 - w) * d
    b = w * d
    num_x = jnp.exp(-b) * (1.0 - jnp.exp(-2.0 * a))
    num_y = jnp.exp(-a) * (1.0 - jnp.exp(-2.0 * b))
    den = jnp.maximum(1.0 - jnp.exp(-2.0 * d), EPS_NORM)
    out = (num_x * xi + num_y * xj) / den
    return jnp.where(d < EXP_ZERO_TOL, xi, out)


def _project(x_new, lane, c):
    x0n = jnp.sum(jnp.where(lane == 0, x_new, 0.0))
    sp_sq = jnp.sum(x_new * x_new) - x0n * x0n
    return jnp.where(lane == 0, jnp.sqrt(1.0 + c * sp_sq), x_new)


def _compose_hash_scalar(h1, h2, bl, ci, cj, powers, rows_per):
    """hash(a+b) lanes for a candidate pair, scalar (scoring.compose_hash).

    int32 modular arithmetic: residues and powers are < 2^15 (15-bit hash
    primes), so products stay < 2^30 — exact in int32, and Mosaic lowers
    int32 multiply/remainder fine (probed on-chip; KERNELS.md).
    """
    blj = _get(bl, cj)
    pw_idx = jnp.minimum(blj, rows_per * LANES - 1)
    pw1 = _get_at(powers, pw_idx, base_row=0)
    pw2 = _get_at(powers, pw_idx, base_row=rows_per)
    nh1 = (_get_at(h1, ci) * pw1 + _get_at(h1, cj)) % jnp.int32(HASH_P1)
    nh2 = (_get_at(h2, ci) * pw2 + _get_at(h2, cj)) % jnp.int32(HASH_P2)
    return nh1, nh2


def _kernel(emb_in, bd_in, bj_in, ln_in, bl_in, vw_in, h1_in, h2_in,
            mhi_in, mlo_in, md_in, qi_in, qj_in, qd_in, qs_in,
            pkh, pkl, pcnt, morph, word, powers, samp_emb, samp_idx,
            si_in, sf_in,
            emb, bd, bj, ln, bl, vw, h1, h2, mhi, mlo, md,
            qi, qj, qd, qs, si, sf,
            vec, buf, sems,
            *, cfg, max_v, d1, n8, g, k_rows, table_size,
            morph_rows, word_rows, pw_rows, n_steps):
    del emb_in  # aliased with emb
    nb = cfg["nb"]
    K = k_rows * LANES
    tile = g * LANES
    n_tiles = n8 // g
    lane = _lane_iota()
    alpha, beta, gamma, comp_w, morph_w = cfg["weights"]

    # One copy-in; the whole segment of steps runs as an IN-KERNEL fori_loop
    # over a single pallas invocation. The round-3 kernel made each step a
    # GRID iteration, which re-staged every VMEM block per step: an empty
    # (halted) grid step measured ~68 us, and with curvature events every
    # 1000 merges ~90% of a 1024-step launch was halted staging (VERDICT r3
    # #4). In-loop steps pay only their own work; a halted iteration is a
    # handful of SMEM reads.
    bd[:] = bd_in[:]
    bj[:] = bj_in[:]
    ln[:] = ln_in[:]
    bl[:] = bl_in[:]
    vw[:] = vw_in[:]
    h1[:] = h1_in[:]
    h2[:] = h2_in[:]
    mhi[:] = mhi_in[:]
    mlo[:] = mlo_in[:]
    md[:] = md_in[:]
    qi[:] = qi_in[:]
    qj[:] = qj_in[:]
    qd[:] = qd_in[:]
    qs[:] = qs_in[:]
    for t in range(NSI):
        si[t, 0] = si_in[t, 0]
    for t in range(NSF):
        sf[t, 0] = sf_in[t, 0]

    def _one_step():
        nm0 = si[SI["nm"], 0]
        vocab0 = si[SI["vocab"], 0]
        c = sf[SF["c"], 0]
        inv_sqrt_c = 1.0 / jnp.sqrt(c)

        # --- hierarchical phase from merge count (enhanced_step) ---
        if cfg["use_hier"]:
            phase = (1 + (nm0 >= cfg["phase2"]).astype(jnp.int32)
                     + (nm0 >= cfg["phase3"]).astype(jnp.int32))
            changed = phase != si[SI["phase"], 0]
            pthr = jnp.where(
                phase == 1, cfg["phase_thresholds"][0],
                jnp.where(phase == 2, cfg["phase_thresholds"][1],
                          cfg["phase_thresholds"][2])).astype(jnp.float32)
            sf[SF["thr"], 0] = jnp.where(changed, pthr, sf[SF["thr"], 0])
            si[SI["phase"], 0] = phase
        pidx = jnp.clip(si[SI["phase"], 0] - 1, 0, 2)
        thr = sf[SF["thr"], 0]

        # --- dense channel: argmin + full feature score ---
        if cfg["use_dense"]:
            best = jnp.min(bd[:])
            row_i = jax.lax.broadcasted_iota(jnp.int32, (n8, LANES), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32, (n8, LANES), 1)
            flat = row_i * LANES + col_i
            di = jnp.min(jnp.where(bd[:] == best, flat, IMAX))
            di = jnp.minimum(di, max_v - 1)  # inert when best == INF
            dj = _get(bj, di)
            dd = best
            dense_valid = jnp.isfinite(dd) & (dd < thr)
            if cfg["max_token_len"] > 0:
                # Merged-token length gate backstop (the fold below keeps
                # overlong pairs out of bd/bj structurally; this guards
                # states whose candidates were rebuilt by a full re-scan).
                dense_valid &= (_get(ln, di) + _get(ln, dj)
                                <= cfg["max_token_len"])

            dense_score = alpha * (1.0 / (1.0 + dd))
            dfreq = jnp.float32(0.0)
            if cfg["use_freq"] or cfg["use_comp"]:
                pos = _searchsorted2(pkh, pkl, di, dj, table_size)
                posc = jnp.minimum(pos, table_size - 1)
                hit = ((_get_at(pkh, posc) == di)
                       & (_get_at(pkl, posc) == dj))
                dfreq = jnp.where(
                    hit,
                    jnp.asarray(_get(pcnt, posc), jnp.float32), 0.0)
            li = _get(ln, di)
            lj = _get(ln, dj)
            if cfg["use_freq"]:
                denom = jnp.log1p(jnp.maximum(sf[SF["maxcnt"], 0], 1.0))
                dense_score += beta * (jnp.log1p(dfreq)
                                       / jnp.maximum(denom, 1e-9))
                # coherence: candidate midpoint vs the per-chunk samples
                cp_i = pltpu.make_async_copy(emb.at[pl.ds(di, 1), :],
                                             vec.at[pl.ds(0, 1), :],
                                             sems.at[0])
                cp_j = pltpu.make_async_copy(emb.at[pl.ds(dj, 1), :],
                                             vec.at[pl.ds(1, 1), :],
                                             sems.at[1])
                cp_i.start()
                cp_j.start()
                cp_i.wait()
                cp_j.wait()
                mid = _midpoint(vec[pl.ds(0, 1), :], vec[pl.ds(1, 1), :],
                                li, lj, lane, d1)
                sig_mid = jnp.where(lane == 0, 1.0,
                                    jnp.where(lane < d1, -1.0, 0.0)) * mid
                gram = jnp.sum(samp_emb[:] * sig_mid, axis=1, keepdims=True)
                dmat = _acosh(jnp.maximum(gram, 1.0 + GRAD_EPS)) * inv_sqrt_c
                sidx = samp_idx[:]                    # (s_pad, 128) bcast
                ok = (sidx != di) & (sidx != dj) & (sidx >= 0)
                # Rows are lane-uniform: the 128x inflation cancels exactly.
                num = jnp.sum(jnp.where(
                    ok, jnp.broadcast_to(dmat, ok.shape), 0.0))
                den = jnp.maximum(jnp.sum(ok.astype(jnp.float32)),
                                  jnp.float32(LANES))
                avg = num / den
                dense_score += gamma / (1.0 + jnp.exp(avg - thr))
            if cfg["use_comp"]:
                total = jnp.maximum(si[SI["corpus_tokens"], 0], 1).astype(
                    jnp.float32)
                ratio = total / jnp.maximum(total - dfreq, 1.0)
                dense_score += comp_w * jnp.clip(ratio - 1.0, 0.0, 1.0)
            if cfg["use_hier"]:
                nh1, nh2 = _compose_hash_scalar(h1, h2, bl, di, dj,
                                                powers, pw_rows)
                mkey = nh1 * jnp.int32(65536) + nh2
                is_morph = _in_sorted_i32(morph, mkey,
                                          si[SI["morph_size"], 0],
                                          morph_rows * LANES)
                vw_or = (_get(vw, di) + _get(vw, dj)) > 0
                mlen = li + lj
                is_word = _in_sorted_i32(word, mkey, si[SI["word_size"], 0],
                                         word_rows * LANES) \
                    | ((mlen >= 3) & vw_or)
                p1s = jnp.where((li <= 2) & (lj <= 2), 0.8, 0.2)
                p2s = jnp.where(is_morph, 0.9, 0.3)
                p3s = jnp.where(is_word, 1.0, 0.4)
                msc = jnp.where(pidx == 0, p1s,
                                jnp.where(pidx == 1, p2s, p3s))
                dense_score += morph_w * msc
        else:
            di = jnp.int32(0)
            dj = jnp.int32(0)
            dd = jnp.float32(INF)
            dense_valid = jnp.bool_(False)
            dense_score = jnp.float32(-INF)

        # --- sparse channel: first nb valid entries of the phase queue ---
        if cfg["needs_corpus"]:
            off = pidx * k_rows
            qsp = qs[pl.ds(off, k_rows), :]
            qdp = qd[pl.ds(off, k_rows), :]
            qip = qi[pl.ds(off, k_rows), :]
            qjp = qj[pl.ds(off, k_rows), :]
            valid = (qsp > -INF) & (qdp < thr)
            if cfg["use_dense"]:
                valid = valid & ~(dense_valid & (qip == di) & (qjp == dj))
            vi = valid.astype(jnp.float32)
            # Exclusive flattened prefix sum without lax.associative_scan
            # (not a Mosaic-lowerable primitive): the within-row inclusive
            # scan is one matmul with an upper-triangular ones matrix
            # (counts <= 128 are exact in f32), and the across-row offset is
            # the same trick transposed via a second small matmul.
            tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                   <= jax.lax.broadcasted_iota(
                       jnp.int32, (LANES, LANES), 1)).astype(jnp.float32)
            row_inc = jax.lax.dot_general(
                vi, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # inclusive
            row_tot = jnp.sum(vi, axis=1, keepdims=True)      # (k_rows, 1)
            # Across rows: strict prefix of row totals. (1, k) @ (k, k) form.
            trik = (jax.lax.broadcasted_iota(jnp.int32, (k_rows, k_rows), 0)
                    < jax.lax.broadcasted_iota(
                        jnp.int32, (k_rows, k_rows), 1)).astype(jnp.float32)
            row_off = jax.lax.dot_general(
                trik, row_tot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (k_rows, 1)
            rank = (row_inc - vi + row_off).astype(jnp.int32)  # exclusive
            take = valid & (rank < nb)
            n_valid = jnp.sum(vi).astype(jnp.int32)
            qv = jnp.where(pidx == 0, si[SI["qv1"], 0],
                           jnp.where(pidx == 1, si[SI["qv2"], 0],
                                     si[SI["qv3"], 0]))
            truncated = qv > K
            consumed_any = nm0 > si[SI["synced"], 0]
            need_rs = truncated & consumed_any & (n_valid < nb)
            if not cfg["use_dense"]:  # == use_dense_channel when needs_corpus
                # Corpus-only mode: fully-consumed queue ends the chunk for
                # a fresh sync (mirrors enhanced_state.enhanced_step).
                n_live = jnp.sum((qsp > -INF).astype(jnp.int32))
                need_rs = need_rs | ((n_live == 0) & consumed_any)
            # Insertion rank of the dense candidate among the (sorted desc)
            # selected sparse scores; ties keep dense first (enhanced_step):
            # every taken queue entry scoring strictly above it precedes it.
            p_rank = jnp.sum(
                jnp.where(take & (qsp > dense_score), 1, 0)).astype(jnp.int32)
        else:
            take = None
            rank = None
            qip = qjp = qdp = qsp = None
            p_rank = jnp.int32(0)
            need_rs = jnp.bool_(False)

        @pl.when(need_rs)
        def _():
            si[SI["resync"], 0] = 1
            si[SI["halt"], 0] = 1

        @pl.when(~need_rs)
        def _merge_round():
            # Candidate slots [0, nb]: the dense candidate sits at its
            # insertion rank, the taken queue entries (already score-sorted)
            # fill the rest. Rolled as a fori_loop — the round-3 kernel
            # unrolled nb+1 copies of this block, which alone put the Mosaic
            # compile at ~70 s (VERDICT r3 #3/#4). Each slot re-derives its
            # queue entry with a masked reduction (one (K/128, 128) sweep).
            # Applied midpoints land in vec rows [2, 2 + applied_rank).
            def _slot_body(t, n_done):
                is_dense = t == p_rank
                if cfg["needs_corpus"]:
                    sp_t = jnp.clip(jnp.where(t > p_rank, t - 1, t),
                                    0, nb - 1)
                    m = take & (rank == sp_t)
                    s_i = jnp.sum(jnp.where(m, qip, 0))
                    s_j = jnp.sum(jnp.where(m, qjp, 0))
                    s_d = jnp.sum(jnp.where(m, qdp, 0.0))
                    s_ok = jnp.sum(m.astype(jnp.int32)) > 0
                else:
                    s_i = jnp.int32(0)
                    s_j = jnp.int32(0)
                    s_d = jnp.float32(INF)
                    s_ok = jnp.bool_(False)
                ci = jnp.where(is_dense, di, s_i)
                cj = jnp.where(is_dense, dj, s_j)
                cd = jnp.where(is_dense, dd, s_d)
                cv = jnp.where(is_dense, dense_valid, s_ok) & jnp.isfinite(cd)
                cv = cv & (vocab0 + n_done < max_v)

                @pl.when(cv)
                def _apply():
                    slot = vocab0 + n_done
                    hslot = nm0 + n_done
                    cp_i = pltpu.make_async_copy(
                        emb.at[pl.ds(ci, 1), :], vec.at[pl.ds(0, 1), :],
                        sems.at[0])
                    cp_j = pltpu.make_async_copy(
                        emb.at[pl.ds(cj, 1), :], vec.at[pl.ds(1, 1), :],
                        sems.at[1])
                    cp_i.start()
                    cp_j.start()
                    cp_i.wait()
                    cp_j.wait()
                    li = _get(ln, ci)
                    lj = _get(ln, cj)
                    x_new = _project(
                        _midpoint(vec[pl.ds(0, 1), :], vec[pl.ds(1, 1), :],
                                  li, lj, lane, d1), lane, c)
                    vec[pl.ds(2 + n_done, 1), :] = x_new
                    cp_w = pltpu.make_async_copy(
                        vec.at[pl.ds(2 + n_done, 1), :],
                        emb.at[pl.ds(slot, 1), :], sems.at[2])
                    cp_w.start()
                    cp_w.wait()
                    _set(ln, slot, li + lj)
                    _set(mhi, hslot, ci)
                    _set(mlo, hslot, cj)
                    _set(md, hslot, cd)
                    # Token features update unconditionally (the XLA
                    # do_merge does — they are state, not a feature gate).
                    nh1, nh2 = _compose_hash_scalar(h1, h2, bl, ci, cj,
                                                    powers, pw_rows)
                    _set(h1, slot, nh1)
                    _set(h2, slot, nh2)
                    _set(bl, slot, _get(bl, ci) + _get(bl, cj))
                    _set(vw, slot,
                         jnp.minimum(_get(vw, ci) + _get(vw, cj), 1))
                    if cfg["needs_corpus"]:
                        # Consume matching entries in ALL phase queues.
                        hitq = (qi[:] == ci) & (qj[:] == cj)
                        qs[:] = jnp.where(hitq, -INF, qs[:])
                    if cfg["use_dense"]:
                        # Invalidate row ci iff its tracked best is consumed
                        # (bj is pre-batch; the fold runs after all inserts).
                        tracked = _get(bj, ci) == cj
                        bdi = _get(bd, ci)
                        _set(bd, ci, jnp.where(tracked, INF, bdi))

                return n_done + cv.astype(jnp.int32)

            n_done = jax.lax.fori_loop(0, nb + 1, _slot_body, jnp.int32(0))
            any_applied = n_done > 0

            # --- batched column fold (merge_batch's candidate maintenance) --
            if cfg["use_dense"]:
                @pl.when(any_applied)
                def _fold():
                    vocab_post = vocab0 + n_done
                    sig = jnp.where(lane == 0, 1.0,
                                    jnp.where(lane < d1, -1.0, 0.0))

                    def dma(slot_, tt):
                        return pltpu.make_async_copy(
                            emb.at[pl.ds(tt * tile, tile), :],
                            buf.at[slot_], sems.at[slot_])

                    dma(0, 0).start()

                    def tile_body(tt, _):
                        sl = tt % 2

                        @pl.when(tt + 1 < n_tiles)
                        def _():
                            dma((tt + 1) % 2, tt + 1).start()

                        dma(sl, tt).wait()
                        b3 = buf[sl].reshape(g, LANES, LANES)
                        ids = (tt * tile
                               + jax.lax.broadcasted_iota(
                                   jnp.int32, (g, LANES), 0) * LANES
                               + jax.lax.broadcasted_iota(
                                   jnp.int32, (g, LANES), 1))

                        # Rolled over the batch (round-3 unrolled nb+1
                        # copies); best-so-far updates go through the refs —
                        # cheap VMEM traffic vs carrying (g, 128) loop state.
                        def _fold_b(b, _):
                            slot_b = vocab0 + b
                            ok_b = b < n_done
                            xb = vec[pl.ds(2 + b, 1), :]
                            sig_x3 = (sig * xb).reshape(1, 1, LANES)
                            gram = jnp.sum(b3 * sig_x3, axis=-1)
                            dcol = _acosh(jnp.maximum(gram, 1.0 + ACOSH_EPS)
                                          ) * inv_sqrt_c
                            mask = ok_b & (ids < slot_b) & (ids < vocab_post)
                            if cfg["max_token_len"] > 0:
                                # Structural length gate (merge_batch's):
                                # rows that cannot legally merge with the
                                # new token never point at it.
                                lnb = _get(ln, slot_b)
                                lns = ln[pl.ds(tt * g, g), :]
                                mask &= (lns + lnb) <= cfg["max_token_len"]
                            dcol = jnp.where(mask, dcol, INF)
                            bds = bd[pl.ds(tt * g, g), :]
                            bjs = bj[pl.ds(tt * g, g), :]
                            imp = dcol < bds
                            bd[pl.ds(tt * g, g), :] = jnp.where(
                                imp, dcol, bds)
                            bj[pl.ds(tt * g, g), :] = jnp.where(
                                imp, slot_b, bjs)
                            return 0

                        jax.lax.fori_loop(0, nb + 1, _fold_b, 0)
                        return 0

                    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

            # --- bookkeeping: counters, empty rounds, threshold growth ---
            si[SI["vocab"], 0] = vocab0 + n_done
            nm1 = nm0 + n_done
            si[SI["nm"], 0] = nm1
            si[SI["empty"], 0] = jnp.where(any_applied, 0,
                                           si[SI["empty"], 0])

            @pl.when(~any_applied)
            def _no_merge():
                empty = si[SI["empty"], 0] + 1
                if cfg["adaptive"]:
                    grow = empty >= cfg["empty_after"]
                    sf[SF["thr"], 0] = jnp.minimum(
                        jnp.where(grow,
                                  sf[SF["thr"], 0] * cfg["empty_growth"],
                                  sf[SF["thr"], 0]), THRESHOLD_CAP)
                    si[SI["empty"], 0] = jnp.where(grow, 0, empty)
                else:
                    si[SI["empty"], 0] = empty
                    si[SI["stopped"], 0] = (
                        empty >= cfg["empty_stop"]).astype(jnp.int32)

            si[SI["step"], 0] = si[SI["step"], 0] + 1
            if cfg["adaptive"] and cfg["growth_every"] > 0:
                ge = cfg["growth_every"]
                grow2 = (nm1 // ge) > (nm0 // ge)
                sf[SF["thr"], 0] = jnp.minimum(
                    jnp.where(grow2, sf[SF["thr"], 0] * cfg["growth"],
                              sf[SF["thr"], 0]), THRESHOLD_CAP)
            full = (si[SI["vocab"], 0] >= max_v).astype(jnp.int32)
            si[SI["stopped"], 0] = si[SI["stopped"], 0] | full

    # --- segment driver: up to n_steps scored steps in this one launch ---
    def _step_iter(s, carry):
        del s
        halt0 = (si[SI["halt"], 0] == 1) | (si[SI["stopped"], 0] == 1) \
            | (si[SI["resync"], 0] == 1) \
            | (si[SI["nm"], 0] >= si[SI["m_budget"], 0]) \
            | (si[SI["step"], 0] >= si[SI["s_budget"], 0]) \
            | (si[SI["nm"], 0] >= si[SI["curv_stop"], 0])
        si[SI["halt"], 0] = halt0.astype(jnp.int32)

        @pl.when(~halt0)
        def _():
            _one_step()

        return carry

    jax.lax.fori_loop(0, n_steps, _step_iter, 0)


# --------------------------------------------------------------- host wrapper

def _ceil_mult(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel_cfg(config) -> dict:
    """Static kernel parameters snapshot from an EnhancedConfig."""
    return dict(
        nb=max(1, config.merge_batch),
        weights=tuple(float(w) for w in config.weights()),
        use_dense=bool(config.use_dense_channel or not config.needs_corpus),
        max_token_len=int(config.base.max_token_len),
        needs_corpus=bool(config.needs_corpus),
        use_freq=bool(config.use_frequency),
        use_comp=bool(config.use_compression),
        use_hier=bool(config.use_hierarchical),
        phase2=int(config.phase2_step),
        phase3=int(config.phase3_step),
        phase_thresholds=tuple(float(t) for t in config.phase_thresholds),
        adaptive=bool(config.base.adaptive_threshold),
        growth_every=int(config.base.threshold_growth_every),
        growth=float(config.base.threshold_growth),
        empty_after=int(config.base.empty_growth_after),
        empty_growth=float(config.base.empty_growth),
        empty_stop=int(config.base.empty_stop_after),
    )


def supports(st, config) -> bool:
    """Shape/config preconditions for the fused enhanced segment kernel."""
    max_v, d1 = st.base.emb.shape
    return (d1 <= LANES
            and config.queue_size % LANES == 0
            and config.freq_table_size % LANES == 0
            and 1 <= max(1, config.merge_batch) <= 32
            and st.hash_powers.shape[1] % LANES == 0)


def _to_rows(x, pad_v, fill):
    n = x.shape[0]
    if pad_v != n:
        x = jnp.pad(x, (0, pad_v - n), constant_values=fill)
    return x.reshape(pad_v // LANES, LANES)


def _pad_table(x, fill):
    n = x.shape[0]
    pad = _ceil_mult(max(n, 1), LANES)
    if pad != n:
        x = jnp.pad(x, (0, pad - n), constant_values=fill)
    return x.reshape(pad // LANES, LANES)


def _run_segment(st, config, m_budget, s_budget, curv_stop,
                 grid: int, interpret: bool = False):
    base = st.base
    max_v, d1 = base.emb.shape
    cfg = _kernel_cfg(config)
    nb = cfg["nb"]
    pad_v = _ceil_mult(max_v, LANES)
    pv = pad_v - max_v
    n8 = pad_v // LANES
    g = _pick_group(n8) if cfg["use_dense"] else 1

    emb = jnp.pad(base.emb, ((0, pv), (0, LANES - d1)))
    bd = _to_rows(base.best_dist, pad_v, INF)
    bj = _to_rows(base.best_j, pad_v, 0)
    ln = _to_rows(base.lengths, pad_v, 0)
    bl = _to_rows(st.byte_lengths, pad_v, 0)
    vw = _to_rows(st.has_vowel.astype(jnp.int32), pad_v, 0)
    h1 = _to_rows(st.token_hash[:, 0], pad_v, 0)
    h2 = _to_rows(st.token_hash[:, 1], pad_v, 0)
    mhi = _to_rows(base.merges[:, 0], pad_v, -1)
    mlo = _to_rows(base.merges[:, 1], pad_v, -1)
    md = _to_rows(base.merge_dists, pad_v, 0.0)

    K = config.queue_size
    k_rows = K // LANES
    qi = st.q_i.reshape(3 * k_rows, LANES)
    qj = st.q_j.reshape(3 * k_rows, LANES)
    qd = st.q_dist.reshape(3 * k_rows, LANES)
    qs = st.q_score.reshape(3 * k_rows, LANES)

    T = config.freq_table_size
    t_rows = T // LANES
    pkh = st.pair_keys[:, 0].reshape(t_rows, LANES)
    pkl = st.pair_keys[:, 1].reshape(t_rows, LANES)
    pcnt = st.pair_counts.reshape(t_rows, LANES)

    morph = _pad_table(st.morph_table, jnp.int32(IMAX))
    word = _pad_table(st.word_table, jnp.int32(IMAX))
    pw_rows = st.hash_powers.shape[1] // LANES
    powers = st.hash_powers.reshape(2 * pw_rows, LANES)

    s_cnt = max(int(st.coh_samples.shape[0]), 1)
    s_pad = _ceil_mult(s_cnt, 8)
    sidx = jnp.pad(st.coh_samples.astype(jnp.int32), (0, s_pad - s_cnt),
                   constant_values=-1)
    samp_emb = jnp.pad(
        base.emb[jnp.clip(sidx, 0, max_v - 1)], ((0, 0), (0, LANES - d1)))
    samp_emb = jnp.where((sidx >= 0)[:, None], samp_emb, 0.0)
    samp_idx = jnp.broadcast_to(sidx[:, None], (s_pad, LANES))

    si = jnp.zeros((NSI, 1), jnp.int32)
    si = si.at[SI["vocab"], 0].set(base.vocab_size)
    si = si.at[SI["nm"], 0].set(base.num_merges)
    si = si.at[SI["step"], 0].set(base.step)
    si = si.at[SI["empty"], 0].set(base.empty_rounds)
    si = si.at[SI["stopped"], 0].set(base.stopped.astype(jnp.int32))
    si = si.at[SI["phase"], 0].set(st.phase)
    si = si.at[SI["resync"], 0].set(st.needs_resync.astype(jnp.int32))
    si = si.at[SI["synced"], 0].set(st.corpus_synced)
    si = si.at[SI["m_budget"], 0].set(jnp.asarray(m_budget, jnp.int32))
    si = si.at[SI["s_budget"], 0].set(jnp.asarray(s_budget, jnp.int32))
    si = si.at[SI["curv_stop"], 0].set(jnp.asarray(curv_stop, jnp.int32))
    si = si.at[SI["morph_size"], 0].set(st.morph_size)
    si = si.at[SI["word_size"], 0].set(st.word_size)
    si = si.at[SI["corpus_tokens"], 0].set(st.corpus_tokens)
    si = si.at[SI["qv1"], 0].set(st.q_valid_total[0])
    si = si.at[SI["qv2"], 0].set(st.q_valid_total[1])
    si = si.at[SI["qv3"], 0].set(st.q_valid_total[2])
    sf = jnp.stack([base.threshold, base.curvature,
                    st.max_pair_count.astype(jnp.float32)]).reshape(NSF, 1)

    kern = functools.partial(
        _kernel, cfg=cfg, max_v=max_v, d1=d1, n8=n8, g=g, k_rows=k_rows,
        table_size=T, morph_rows=morph.shape[0], word_rows=word.shape[0],
        pw_rows=pw_rows, n_steps=grid)

    def vmem(shape):
        return pl.BlockSpec(shape, lambda s: (0, 0),
                            memory_space=pltpu.VMEM)

    n2 = (n8, LANES)
    q2 = (3 * k_rows, LANES)
    t2 = (t_rows, LANES)
    state_shapes = [
        jax.ShapeDtypeStruct((pad_v, LANES), jnp.float32),   # emb
        jax.ShapeDtypeStruct(n2, jnp.float32),               # bd
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # bj
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # ln
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # bl
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # vw
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # h1
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # h2
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # mhi
        jax.ShapeDtypeStruct(n2, jnp.int32),                 # mlo
        jax.ShapeDtypeStruct(n2, jnp.float32),               # md
        jax.ShapeDtypeStruct(q2, jnp.int32),                 # qi
        jax.ShapeDtypeStruct(q2, jnp.int32),                 # qj
        jax.ShapeDtypeStruct(q2, jnp.float32),               # qd
        jax.ShapeDtypeStruct(q2, jnp.float32),               # qs
        jax.ShapeDtypeStruct((NSI, 1), jnp.int32),           # si
        jax.ShapeDtypeStruct((NSF, 1), jnp.float32),         # sf
    ]
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]
        + [vmem(n2)] * 10 + [vmem(q2)] * 4
        + [vmem(t2)] * 3
        + [vmem(morph.shape), vmem(word.shape), vmem(powers.shape),
           vmem(samp_emb.shape), vmem(samp_idx.shape)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    )
    out_specs = ([pl.BlockSpec(memory_space=pl.ANY)]
                 + [vmem(n2)] * 10 + [vmem(q2)] * 4
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2)

    out = pl.pallas_call(
        kern,
        grid=(1,),  # steps run as an in-kernel fori_loop (module docstring)
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=state_shapes,
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((nb + 3, LANES), jnp.float32),          # vec
            pltpu.VMEM((2, g * LANES, LANES), jnp.float32),    # fold buffer
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(emb, bd, bj, ln, bl, vw, h1, h2, mhi, mlo, md, qi, qj, qd, qs,
      pkh, pkl, pcnt, morph, word, powers, samp_emb, samp_idx, si, sf)

    (emb_o, bd_o, bj_o, ln_o, bl_o, vw_o, h1_o, h2_o, mhi_o, mlo_o, md_o,
     qi_o, qj_o, qd_o, qs_o, si_o, sf_o) = out

    def rows_to(x):
        return x.reshape(pad_v)[:max_v]

    base_o = base.replace(
        emb=emb_o[:max_v, :d1],
        best_dist=rows_to(bd_o),
        best_j=rows_to(bj_o),
        lengths=rows_to(ln_o),
        merges=jnp.stack([rows_to(mhi_o), rows_to(mlo_o)], axis=-1),
        merge_dists=rows_to(md_o),
        vocab_size=si_o[SI["vocab"], 0],
        num_merges=si_o[SI["nm"], 0],
        step=si_o[SI["step"], 0],
        empty_rounds=si_o[SI["empty"], 0],
        stopped=si_o[SI["stopped"], 0].astype(jnp.bool_),
        threshold=sf_o[SF["thr"], 0],
    )
    return st.replace(
        base=base_o,
        phase=si_o[SI["phase"], 0],
        needs_resync=si_o[SI["resync"], 0].astype(jnp.bool_),
        byte_lengths=rows_to(bl_o),
        has_vowel=rows_to(vw_o).astype(jnp.bool_),
        token_hash=jnp.stack([rows_to(h1_o), rows_to(h2_o)], axis=-1),
        q_i=qi_o.reshape(3, K),
        q_j=qj_o.reshape(3, K),
        q_dist=qd_o.reshape(3, K),
        q_score=qs_o.reshape(3, K),
    )


@functools.partial(jax.jit,
                   static_argnames=("config", "grid", "interpret"),
                   donate_argnames=("st",))
def _run_chunk_fused(st, config, n_steps, grid: int,
                     interpret: bool = False):
    """Whole chunk as ONE jit: an XLA ``while_loop`` relaunches the segment
    kernel and applies the adaptive-curvature Adam step between segments
    entirely on-device.

    Round 4's wrapper orchestrated segments from the HOST: one
    ``int(num_merges)`` fetch + one curvature-update dispatch per segment.
    At the reference's flagship ``optimize_curvature_freq=100`` that is ~20
    round-trips per 2048-merge chunk, and on the tunneled TPU transport a
    host fetch costs ~100 ms+ — measured 705 merges/s all-features steady
    while bpe-mode (2 events/chunk) ran 3,400/s. Device-side orchestration
    removes every per-segment round-trip; the host now touches the chunk
    only at sync boundaries. Ordering is identical to the XLA while-loop
    path: update fires before the segment that follows its crossing (the
    host loop additionally applied a trailing pending update on exit, which
    the XLA path never did — this matches the XLA path).

    ``n_steps`` is a TRACED argument: the chunk wrapper re-enters with a
    different ``remaining`` after every mid-chunk resync, and a static
    budget would compile a fresh chunk executable per value (measured
    3-6 s recompiles inside late windows).
    """
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    freq = config.curvature_freq if config.use_adaptive_curvature else 0
    m_budget = st.base.num_merges + n_steps
    s_budget = st.base.step + n_steps + 1024

    def cond(s):
        return ((~s.base.stopped) & (~s.needs_resync)
                & (s.base.num_merges < m_budget)
                & (s.base.step < s_budget))

    def body(s):
        if config.use_adaptive_curvature:
            s = E._maybe_update_curvature(s, config)
        if freq > 0:
            curv_stop = (s.curv_last // freq + 1) * freq
        else:
            curv_stop = jnp.int32(1 << 30)
        return _run_segment(s, config, m_budget, s_budget, curv_stop,
                            grid=grid, interpret=interpret)

    return jax.lax.while_loop(cond, body, st)


def run_enhanced_fused(st, config, n_steps: int, interpret: bool = False,
                       segment_grid: int = 1024):
    """Run one enhanced chunk with the fused segment kernel.

    Same contract as ``enhanced_state.run_enhanced``: sync corpus statistics,
    then merge up to ``n_steps`` tokens (queue exhaustion or candidate
    drought may end earlier; the caller's chunk loop resyncs). Kernel
    segments halt at adaptive-curvature events; segment relaunches and the
    curvature Adam step run inside one jitted device-side while loop
    (``_run_chunk_fused``) with zero per-segment host round-trips.
    """
    from hyptokenizer_tpu.tokenizer import enhanced_state as E

    st = E.sync_corpus_jit(st, config)
    return _run_chunk_fused(st, config, n_steps, grid=segment_grid,
                            interpret=interpret)
