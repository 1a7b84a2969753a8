import time
import numpy as np
import jax, jax.numpy as jnp, optax
from dgcnn_tpu.batching.dense import build_dense_dataset, dense_tile, order_matrix, gather_dense_batch
from dgcnn_tpu.data.datasets import load_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, init_params, apply_dense
from dgcnn_tpu.train.loop import make_dense_gather_epochs

gs, _ = load_dataset("NCI1", allow_download=False, allow_synthetic=True)
rng = np.random.default_rng(324)
perm = rng.permutation(gs.num_graphs)
train = gs.subset(perm[: int(gs.num_graphs * 0.9)])
n_tile = dense_tile(train)
data = jax.device_put(build_dense_dataset(train, n_tile))
model = DGCNN(num_features=train.num_features, num_classes=train.num_classes)
params = init_params(jax.random.PRNGKey(324), model)
opt = optax.adam(1e-3)
tr, _ = make_dense_gather_epochs(model, opt)
shuffle = np.random.default_rng(7)

def timeit(fn, reps=5):
    fn(-1)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter(); fn(r); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

# scaling with step count -> fixed overhead vs per-step cost
for nsteps in (1, 8, 32, 67):
    st = {"p": params, "s": opt.init(params), "k": jax.random.PRNGKey(0)}
    def one(r, nsteps=nsteps):
        order2d = order_matrix(shuffle.permutation(train.num_graphs)[:nsteps*50], 50, 56)
        st["p"], st["s"], st["k"], loss, _ = tr(st["p"], st["s"], st["k"], data, order2d)
        return float(loss)
    print(f"steps={nsteps:3d}  epoch_ms={timeit(one):8.2f}")

# ablations inside one step: forward-only, gather-only, fwd without sortpool
order = order_matrix(np.arange(67*50), 50, 56)
order_d = jax.device_put(order)

@jax.jit
def fwd_scan(params, data, order2d):
    def body(acc, idx):
        b = gather_dense_batch(data, idx)
        lp = apply_dense(params, model, b)
        return acc + lp.sum(), None
    out, _ = jax.lax.scan(body, 0.0, order2d)
    return out

@jax.jit
def gather_scan(params, data, order2d):
    def body(acc, idx):
        b = gather_dense_batch(data, idx)
        return acc + b.adj.sum() + b.x.sum(), None
    out, _ = jax.lax.scan(body, 0.0, order2d)
    return out

for name, fn in (("fwd_only", fwd_scan), ("gather_only", gather_scan)):
    def one(r, fn=fn):
        return float(fn(params, data, jnp.asarray(order + 0*r)))
    print(f"{name:12s} 67steps_ms={timeit(one):8.2f}")
