"""On-device greedy track-id assignment + the per-clip ``lax.scan`` loop.

The reference assigns ids with a per-instance python loop over the match
matrix (reference mmdet/models/detectors/vps_temporal_slots.py:361-406);
``tracking.TrackState`` is this repo's host-side port.  This module is the
jit/scan form: the order-dependent greedy rules become closed-form
rank/argmax computations over fixed-capacity padded arrays, so a whole
video runs as ONE ``lax.scan`` with no host round-trips (SURVEY §7 step 6).

Exact semantics reproduced (verified against TrackState in
tests/test_tracking_jax.py):
  * row decision = argmax of log-softmax over [new | pool] columns,
  * all rows claiming the same pool id: the highest likelihood wins (ties:
    earliest row — the reference's strict ``>`` update),
  * first-pass new objects (column 0) get ids ``pool_size + rank`` in row
    order; demoted losers get ids after all first-pass news, in row order,
  * winners overwrite their pool embedding; news append in id order.

Fixed capacity: the pool holds ``pool_capacity`` embeddings; appends past
capacity are dropped (the reference eval caps track growth anyway,
tools/dataset/cityscapes_vps.py:220-244 ``max_oid=100``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


class PoolState(NamedTuple):
    """Fixed-capacity track pool (carried through the video scan)."""

    embeddings: jnp.ndarray  # [P, D] f32
    size: jnp.ndarray        # [] int32 — number of live ids
    started: jnp.ndarray     # [] bool — pool initialized this video


def init_pool(capacity: int, dim: int) -> PoolState:
    return PoolState(
        embeddings=jnp.zeros((capacity, dim), jnp.float32),
        size=jnp.zeros((), jnp.int32),
        started=jnp.zeros((), bool),
    )


def start_pool(pool: PoolState, cur_emb: jnp.ndarray,
               cur_valid: jnp.ndarray) -> Tuple[jnp.ndarray, PoolState]:
    """First frame: ids are 0..N-1 in row order (reference :332-339).

    cur_emb: [K, D] padded; cur_valid: [K] bool (kept rows, in order —
    invalid rows must be all-False tail or interleaved; ids follow the
    rank among valid rows)."""
    p = pool.embeddings.shape[0]
    rank = jnp.cumsum(cur_valid.astype(jnp.int32)) - 1      # [K]
    ids = jnp.where(cur_valid, rank, -1)
    slot = jnp.where(cur_valid, ids, p)                     # p = OOB: dropped
    emb = pool.embeddings.at[slot].set(cur_emb, mode="drop")
    n = jnp.minimum(cur_valid.sum(), p).astype(jnp.int32)
    return ids.astype(jnp.int32), PoolState(emb, n, jnp.ones((), bool))


def update_pool(pool: PoolState, match_score: jnp.ndarray,
                cur_emb: jnp.ndarray, cur_valid: jnp.ndarray
                ) -> Tuple[jnp.ndarray, PoolState]:
    """One tracking step (reference :345-409 / tracking.TrackState.update).

    match_score: [K, P+1] — column 0 = new object, column j+1 = pool id j
    (invalid pool columns and invalid rows are masked here).
    Returns (ids [K] int32, new pool)."""
    k, pcols = match_score.shape
    p = pcols - 1
    m = pool.size
    col_valid = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.arange(p) < m])           # [P+1]
    score = jnp.where(col_valid[None, :], match_score, _NEG)
    logprob = jax.nn.log_softmax(score, axis=1)
    likelihood = logprob.max(axis=1)
    match_ids = logprob.argmax(axis=1)                       # [K]
    match_ids = jnp.where(cur_valid, match_ids, 0)

    # winner per pool id: highest likelihood among claimers, earliest row
    # on ties (strict > in the reference loop)
    claims = (match_ids[:, None] == jnp.arange(1, p + 1)[None, :]) \
        & cur_valid[:, None]                                  # [K, P]
    claim_score = jnp.where(claims, likelihood[:, None], _NEG)
    winner_row = jnp.argmax(claim_score, axis=0)              # [P]
    has_winner = claims[winner_row, jnp.arange(p)]            # [P]
    is_winner = jnp.zeros((k,), bool).at[
        jnp.where(has_winner, winner_row, k)].set(True, mode="drop")

    is_new_first = cur_valid & (match_ids == 0)
    is_loser = cur_valid & (match_ids > 0) & ~is_winner

    n_first = is_new_first.sum()
    rank_first = jnp.cumsum(is_new_first.astype(jnp.int32)) - 1
    rank_loser = jnp.cumsum(is_loser.astype(jnp.int32)) - 1

    ids = jnp.where(is_winner, match_ids - 1, -1)
    ids = jnp.where(is_new_first, m + rank_first, ids)
    ids = jnp.where(is_loser, m + n_first + rank_loser, ids)
    ids = jnp.where(cur_valid, ids, -1).astype(jnp.int32)

    # pool update: winners replace, news append (drop past capacity —
    # slot >= p is out of bounds and mode="drop" writes nothing, so an
    # over-capacity append can never clobber slot p-1's winner)
    slot = jnp.where(cur_valid & (ids >= 0) & (ids < p), ids, p)
    emb = pool.embeddings.at[slot].set(cur_emb, mode="drop")
    new_size = jnp.minimum(m + n_first + is_loser.sum(), p).astype(jnp.int32)
    return ids, PoolState(emb, new_size, pool.started)


def track_step(pool: PoolState, match_score: jnp.ndarray,
               cur_emb: jnp.ndarray, cur_valid: jnp.ndarray
               ) -> Tuple[jnp.ndarray, PoolState]:
    """start_pool on the first frame of a video, update_pool after."""
    return jax.lax.cond(
        pool.started,
        lambda: update_pool(pool, match_score, cur_emb, cur_valid),
        lambda: start_pool(pool, cur_emb, cur_valid),
    )
