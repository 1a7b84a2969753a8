"""Halo-exchange edge-partitioned forward (SURVEY §2e item 2).

The node axis is sharded over the mesh "graph" axis (see
batching/shard_pack.py). Per GCN layer, each device:

  1. computes `H = XΘ` for its OWN node shard (MXU),
  2. scales rows by its local d̂^{-1/2} (the sym-norm's source side),
  3. exchanges boundary rows with BOTH neighbors via two `ppermute`s
     (O(halo·F) over ICI — vs the replicated path's O(N_pad·F) psum),
  4. segment-sums its local, dst-sorted edge chunk over the extended
     [halo | local | halo] feature window — all destinations are local
     by the dst-partitioning, so no reduction collective is needed.

XLA's latency-hiding scheduler overlaps the ppermutes with the local
work that doesn't depend on them (the self-loop term and the degree
scaling) — the boundary exchange is issued as early as the layer's
matmul completes.

SortPooling runs shard-locally: each graph's owner sees the whole graph
inside its extended window (shard_pack invariant), so pooled rows,
readout and loss need only the final `psum` over ("data", "graph") that
every engine already does. Degrees are exchanged ONCE per batch (they
are layer-invariant).

Exactness: logits of owned graphs equal the single-device apply_coo
bitwise up to fp reduction order — pinned by
tests/test_halo.py::test_partition_invariance.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from dgcnn_tpu.batching.shard_pack import HaloBatch
from dgcnn_tpu.models.dgcnn import DGCNN, Params, _pooled_to_log_probs
from dgcnn_tpu.ops.sort_pool import sort_pool


def _exchange(arr: jax.Array, h: int, axis: str) -> jax.Array:
    """[S, F] → [h+S+h, F]: receive the left neighbor's LAST h rows and
    the right neighbor's FIRST h rows. Devices with no source (the chain
    ends) receive zeros — exactly what out-of-batch halo rows must be."""
    n = jax.lax.axis_size(axis)
    right_perm = [(i, i + 1) for i in range(n - 1)]
    left_perm = [(i + 1, i) for i in range(n - 1)]
    left_halo = jax.lax.ppermute(arr[-h:], axis, perm=right_perm)
    right_halo = jax.lax.ppermute(arr[:h], axis, perm=left_perm)
    return jnp.concatenate([left_halo, arr, right_halo], axis=0)


def apply_halo(
    params: Params,
    model: DGCNN,
    batch: HaloBatch,  # shard-local view ([S, ...] leaves, no shard axis)
    *,
    axis: str = "graph",
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
):
    """Shard-local forward → log-probs [B_s, C] for OWNED graphs (padded
    slots garbage, masked by batch.graph_mask). Call inside shard_map."""
    h = batch.halo
    s = batch.x.shape[0]
    num_slots = batch.y.shape[0]
    dt = jnp.dtype(model.compute_dtype)

    # local in-degree over the dst-partitioned edge chunk + the re-added
    # self-loop; every destination is local so this is collective-free
    deg_hat = jax.ops.segment_sum(
        batch.edge_mask, batch.edge_dst_loc, num_segments=s,
        indices_are_sorted=True,
    ) + 1.0
    dinv = jax.lax.rsqrt(deg_hat)
    # one exchange per batch: the SOURCE side of the sym-norm needs halo
    # rows' d̂^{-1/2}; fold it into the exchanged features instead of
    # shipping degrees per layer
    x = batch.x.astype(dt)
    mask = batch.node_mask[:, None]

    layer_outs = []
    for layer in params["gcn"]:
        hw = jnp.dot(x, layer["w"].astype(dt),
                     preferred_element_type=jnp.float32)
        hw_ext = _exchange(hw * dinv[:, None], h, axis)
        gathered = jnp.take(hw_ext, batch.edge_src_ext, axis=0)
        agg = jax.ops.segment_sum(
            gathered * batch.edge_mask[:, None], batch.edge_dst_loc,
            num_segments=s, indices_are_sorted=True,
        ) * dinv[:, None]
        x = jnp.tanh(agg + hw * (1.0 / deg_hat)[:, None] + layer["b"])
        x = (x * mask).astype(dt)
        layer_outs.append(x)

    cat = jnp.concatenate(layer_outs, axis=-1)
    cat_ext = _exchange(cat, h, axis)
    pooled = sort_pool(cat_ext, batch.node_graph_ext, num_slots,
                       model.sort_pool_k)
    return _pooled_to_log_probs(
        params, model, pooled, deterministic, dropout_rng, {}
    )


def make_halo_loss(
    model: DGCNN, mesh: Mesh, halo: int, deterministic: bool = False
) -> Callable:
    """(params, batch, rng) → replicated (global mean loss, correct).

    `batch` is a HaloBatch whose leaves carry ONE leading axis of length
    n_data·n_graph (data-major: sub-batch d's shards occupy rows
    [d·G, (d+1)·G)), sharded P(("data", "graph")) so each device holds
    exactly its (sub-batch, shard) block. Differentiable — grads
    replicate through the double psum."""
    from dgcnn_tpu.parallel.train_dp import _loss_terms

    specs = _halo_pspecs(halo)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=(P(), P()),
    )
    def f(params, batch, rng):
        local = jax.tree_util.tree_map(lambda a: a[0], batch)
        dropout_rng = jax.random.fold_in(
            rng, jax.lax.axis_index("graph")
            + jax.lax.axis_size("graph") * jax.lax.axis_index("data")
        )
        lp = apply_halo(
            params, model, local,
            deterministic=deterministic,
            dropout_rng=None if deterministic else dropout_rng,
        )
        loss_sum, correct = _loss_terms(lp, local.y, local.graph_mask)
        total = jnp.maximum(
            jax.lax.psum(jax.lax.psum(local.graph_mask.sum(), "graph"),
                         "data"),
            1.0,
        )
        loss = jax.lax.psum(jax.lax.psum(loss_sum, "graph"), "data") / total
        correct = jax.lax.psum(jax.lax.psum(correct, "graph"), "data")
        return loss, correct

    return f


def make_halo_train_epoch(
    model: DGCNN, optimizer, mesh: Mesh, halo: int
) -> Callable:
    """Jitted `(params, opt_state, rng, batches) → (params, opt_state,
    rng, mean_loss, correct)`; `batches` laid out per
    batching.shard_pack.pack_epoch_halo ([steps, D·G, ...] leaves)."""
    import optax

    sharded_loss = make_halo_loss(model, mesh, halo, deterministic=False)

    def step(carry, batch):
        params, opt_state, rng = carry
        rng, sub = jax.random.split(rng)
        (loss, correct), grads = jax.value_and_grad(
            lambda p: sharded_loss(p, batch, sub), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), (loss, correct)

    @jax.jit
    def train_epoch(params, opt_state, rng, batches):
        (params, opt_state, rng), (losses, corrects) = jax.lax.scan(
            step, (params, opt_state, rng), batches
        )
        # per-batch-mean loss: the reference's train.py:47 contract
        return params, opt_state, rng, losses.mean(), corrects.sum()

    return train_epoch


def make_halo_eval_epoch(model: DGCNN, mesh: Mesh, halo: int) -> Callable:
    sharded_loss = make_halo_loss(model, mesh, halo, deterministic=True)
    dummy = jax.random.PRNGKey(0)

    @jax.jit
    def eval_epoch(params, batches):
        def body(carry, batch):
            loss, correct = sharded_loss(params, batch, dummy)
            return carry, (loss, correct)

        _, (losses, corrects) = jax.lax.scan(body, None, batches)
        return losses.mean(), corrects.sum()

    return eval_epoch


def device_put_halo_epoch(batches: HaloBatch, mesh: Mesh, halo: int):
    """Place a packed halo epoch on the mesh: every leaf carries
    [steps, D·G, ...] with the device axis sharded P(("data", "graph"))."""
    from jax.sharding import NamedSharding

    specs = _halo_pspecs(halo)
    return jax.tree_util.tree_map(
        lambda arr, spec: jax.device_put(
            arr, NamedSharding(mesh, P(None, *spec))
        ),
        batches,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _halo_pspecs(halo: int) -> HaloBatch:
    """PartitionSpecs for a HaloBatch whose leaves carry one leading
    (data-major) device axis; `halo` must equal the batch's static meta
    so the spec pytree and the batch pytree match."""
    leading = P(("data", "graph"))
    return HaloBatch(
        x=leading, edge_src_ext=leading, edge_dst_loc=leading,
        edge_mask=leading, node_mask=leading, node_graph_ext=leading,
        y=leading, graph_mask=leading, num_graphs=leading, halo=halo,
    )
