"""Train a small MPNet (encoder + planner MLPs) on demonstration paths.

Reads the npz dataset written by examples/prepare_mpnet_dataset.py, trains
the exact architecture of planning/mpnet.py (reference mpnet_planner.py:24-61)
jointly with Adam on next-waypoint MSE (forward and reversed paths, as the
reference's bidirectional planner consumes), and saves torch state dicts
loadable by plan_with_mpnet --encoder/--planner.

Usage: python tools/train_mpnet.py [--data /tmp/mpnet_dataset] [--out /tmp/mpnet_ckpt]
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.planning import mpnet


def load_dataset(data_dir, d):
    pcs, samples = [], []
    rng = np.random.default_rng(0)
    files = sorted(Path(data_dir).glob("*.npz"))
    for pi, f in enumerate(files):
        z = np.load(f)
        pc = z["pointcloud"].reshape(-1, 3)
        if len(pc) > mpnet.MAX_POINTCLOUD_SIZE:
            pc = pc[rng.choice(len(pc), mpnet.MAX_POINTCLOUD_SIZE, replace=False)]
        elif len(pc) < mpnet.MAX_POINTCLOUD_SIZE:
            pc = np.vstack([pc, np.zeros((mpnet.MAX_POINTCLOUD_SIZE - len(pc), 3), np.float32)])
        pcs.append(pc.reshape(-1).astype(np.float32))
        path = z["path"].astype(np.float32)
        for p in (path, path[::-1]):
            goal = p[-1]
            for i in range(len(p) - 1):
                samples.append((pi, p[i], goal, p[i + 1]))
    pcs = np.stack(pcs)
    pidx = np.array([s[0] for s in samples], np.int32)
    cur = np.stack([s[1] for s in samples])
    goal = np.stack([s[2] for s in samples])
    nxt = np.stack([s[3] for s in samples])
    return pcs, pidx, cur, goal, nxt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/mpnet_dataset")
    ap.add_argument("--out", default="/tmp/mpnet_ckpt")
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from vamp_mvt_tpu.robots import registry

    spec = registry.load(args.robot)
    d = spec.dimension
    pcs, pidx, cur, goal, nxt = load_dataset(args.data, d)
    print(f"dataset: {len(pcs)} clouds, {len(cur)} waypoint pairs")

    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    enc = mpnet.init_mlp(k1, (mpnet.MAX_POINTCLOUD_SIZE * 3,) + mpnet.ENCODER_WIDTHS)
    pla = mpnet.init_mlp(k2, (mpnet.LATENT + 2 * d,) + mpnet.PLANNER_WIDTHS + (d,))

    import optax

    opt = optax.adam(args.lr)
    params = (enc, pla)
    opt_state = opt.init(params)

    pcs_j = jnp.asarray(pcs)

    def loss_fn(params, pi, c, g, n):
        enc, pla = params
        lat = jax.vmap(lambda x: mpnet.mlp_apply(enc, x))(pcs_j[pi])
        inp = jnp.concatenate([lat, c, g], axis=-1)
        pred = jax.vmap(lambda x: mpnet.mlp_apply(pla, x))(inp)
        return jnp.mean((pred - n) ** 2)

    @jax.jit
    def step(params, opt_state, pi, c, g, n):
        l, grads = jax.value_and_grad(loss_fn)(params, pi, c, g, n)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    N = len(cur)
    rng = np.random.default_rng(1)
    for ep in range(args.epochs):
        order = rng.permutation(N)
        tot = 0.0
        nb = 0
        for off in range(0, N - args.batch + 1, args.batch):
            idx = order[off : off + args.batch]
            params, opt_state, l = step(
                params, opt_state, jnp.asarray(pidx[idx]), jnp.asarray(cur[idx]),
                jnp.asarray(goal[idx]), jnp.asarray(nxt[idx]),
            )
            tot += float(l)
            nb += 1
        if ep % 50 == 0 or ep == args.epochs - 1:
            print(f"epoch {ep:4d}  loss {tot / max(nb,1):.5f}", flush=True)

    # save as torch state dicts (the loader plan_with_mpnet expects)
    import torch

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name, pr in (("encoder", params[0]), ("planner", params[1])):
        sd = {}
        for i, (W, b, alpha) in enumerate(pr):
            sd[f"fc.{2 * i}.weight"] = torch.tensor(np.asarray(W).T)
            sd[f"fc.{2 * i}.bias"] = torch.tensor(np.asarray(b))
        torch.save(sd, out / f"{name}.pt")
    print(f"saved to {out}")


if __name__ == "__main__":
    main()
