"""Device-mesh parallelism: data-parallel EM over pjit/shard_map.

Replaces the reference's entire parallel runtime — ``SplitData`` +
``std::thread`` per shard + per-job accumulator files + ``GmmSumAccs``
(SURVEY.md §2.6) — with a mesh:

* utterances are sharded over the ``data`` axis ([B, ...] leading dim);
* GMM parameters and decode graphs are replicated (a ``model`` axis exists for
  sharding very large mixture inventories later);
* E-step sufficient statistics are ``psum``-reduced over ``data`` — the
  file-barrier reduction becomes one ICI/DCN collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import align_band as AB
from ..ops import gmm_kernels as K
from ..ops import viterbi as V

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    dev = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Place leading-axis-sharded arrays on the mesh (data-parallel)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def em_estep_sharded(mesh: Mesh, num_states: int, num_pdfs: int, num_tids: int):
    """Build the jitted, mesh-sharded EM E-step:

    (gmm params, per-utterance padded graphs, feats, frame counts, acwt)
      -> (alpha_end, backpointers, stats psum-reduced over the data axis)

    The Viterbi forward runs sharded (each chip advances its own utterances);
    statistics are computed from the *previous* iteration's alignments
    (tids/weights) and reduced with psum — matching the reference's EM loop
    structure where realignment and stats use the current model (§3.1).
    """
    from jax import shard_map  # keyword-only API (jax >= 0.8)

    data_spec = P(DATA_AXIS)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep,  # params
                  data_spec, data_spec, data_spec, data_spec, data_spec,  # graphs (incl. levels tuple)
                  data_spec, data_spec,  # feats, num_frames
                  data_spec, data_spec, data_spec,  # tids, pdf_ids, weights
                  rep),  # acoustic scale
        # bps is [T, B, S]: the batch axis is dim 1
        out_specs=(data_spec, P(None, DATA_AXIS), rep, rep, rep, rep, rep),
        check_vma=False,
    )
    def step(params, arc_src, levels, arc_pdf, arc_score, alpha0,
             feats, num_frames, tids, pdf_ids_in, weights, acwt):
        b, t, d = feats.shape
        ll = K.loglikes_batch(params, feats)
        alpha_end, bps = V.viterbi_forward_batched(
            arc_src, levels, arc_pdf, arc_score, alpha0,
            ll, num_frames, acwt, jnp.float32(1e9), num_states)
        # stats from given alignments (previous realign), psum over mesh
        x = feats.reshape(b * t, d)
        pdf_ids = pdf_ids_in.reshape(-1)
        w = weights.reshape(-1)
        occ, macc, vacc, ll_tot = K.acc_gmm_stats_aligned(
            params, x, pdf_ids, num_pdfs, w)
        tstats = K.acc_transition_stats(tids.reshape(-1), num_tids, w)
        occ = jax.lax.psum(occ, DATA_AXIS)
        macc = jax.lax.psum(macc, DATA_AXIS)
        vacc = jax.lax.psum(vacc, DATA_AXIS)
        tstats = jax.lax.psum(tstats, DATA_AXIS)
        ll_tot = jax.lax.psum(ll_tot, DATA_AXIS)
        return alpha_end, bps, occ, macc, vacc, tstats, ll_tot

    return jax.jit(step)


def decode_forward_sharded(mesh: Mesh, packed: bool, rspec: tuple):
    """Mesh-sharded decode forward over a replicated HCLG: the production
    in-degree-row kernel (ops/decode_core.viterbi_scan) with utterances
    data-parallel in the batch-minor layout (batch is the LAST axis of the
    ``alpha [S+1, B]`` slabs and of ``bps [T, S+1, B]``), the EmitPlan
    replicated, and no cross-device communication in the forward itself —
    the P1 design (SURVEY.md §2.6): each chip advances its own utterances,
    hypotheses join on the host.

    -> jitted step(dev: EmitPlanDev, alpha, alpha_end, loglikes [B, T, P],
    num_frames [B], acwt) -> (alpha, alpha_end, bps)."""
    from jax import shard_map

    from ..ops import decode_core as DC

    rep = P()
    batch_minor = P(None, DATA_AXIS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, batch_minor, batch_minor, P(DATA_AXIS), P(DATA_AXIS),
                  rep),
        out_specs=(batch_minor, batch_minor, P(None, None, DATA_AXIS)),
        check_vma=False,
    )
    def step(dev, alpha, alpha_end, loglikes, num_frames, acwt):
        (a, ae), bps = DC.viterbi_scan(
            dev, alpha, alpha_end, loglikes, num_frames, jnp.int32(0),
            acwt, jnp.float32(0.0), rspec, packed, False)
        return a, ae, bps

    return jax.jit(step)


def em_estep_sharded_banded(mesh: Mesh, num_pdfs: int, num_tids: int,
                            offsets: tuple):
    """Banded-kernel variant of :func:`em_estep_sharded` — the production
    alignment path (ops/align_band.py: gather-free shifts + one-hot MXU
    emissions) sharded over the data axis.  Inputs take the BandPlan arrays
    (W [B,S,K], pdf [B,S], alpha0 [B,S]) in place of padded arc arrays;
    ``offsets`` is the plan's static band-offset tuple.  T must be a
    multiple of 128, or at most 128."""
    from jax import shard_map

    data_spec = P(DATA_AXIS)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep,  # params
                  data_spec, data_spec, data_spec,  # W, pdf, alpha0
                  data_spec, data_spec,  # feats, num_frames
                  data_spec, data_spec, data_spec,  # tids, pdf_ids, weights
                  rep),  # acoustic scale
        out_specs=(data_spec, P(None, DATA_AXIS), rep, rep, rep, rep, rep),
        check_vma=False,
    )
    def step(params, w_band, pdf_band, alpha0, feats, num_frames, tids,
             pdf_ids_in, weights, acwt):
        b, t, d = feats.shape
        assert t <= 128 or t % 128 == 0, \
            "banded EM step: T must be <=128 or a multiple of 128"
        ll = K.loglikes_batch(params, feats)
        alpha_end, bps = AB.viterbi_forward_banded(
            w_band, pdf_band, alpha0, ll, num_frames, acwt, offsets,
            t_chunk=min(t, 128))
        x = feats.reshape(b * t, d)
        pdf_ids = pdf_ids_in.reshape(-1)
        w = weights.reshape(-1)
        occ, macc, vacc, ll_tot = K.acc_gmm_stats_aligned(
            params, x, pdf_ids, num_pdfs, w)
        tstats = K.acc_transition_stats(tids.reshape(-1), num_tids, w)
        occ = jax.lax.psum(occ, DATA_AXIS)
        macc = jax.lax.psum(macc, DATA_AXIS)
        vacc = jax.lax.psum(vacc, DATA_AXIS)
        tstats = jax.lax.psum(tstats, DATA_AXIS)
        ll_tot = jax.lax.psum(ll_tot, DATA_AXIS)
        return alpha_end, bps, occ, macc, vacc, tstats, ll_tot

    return jax.jit(step)
