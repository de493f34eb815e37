"""Out-of-core workflow: build a dataset ON DISK panel by panel, then
run gram / regression / GLM / PCA / KMeans without ever holding it in
device (or host) memory.

Peak HBM for every op here is one row panel + a (d, d)-or-smaller
accumulator — the dataset size is bounded by DISK, not by the chip.
(The reference gets this only from Ray plasma's spilling across a
cluster's aggregate memory.)

Usage: python examples/out_of_core.py [--rows 400000] [--cols 64]
"""

import argparse
import time

import numpy as np

import nums_tpu
from nums_tpu.core.array.diskarray import DiskArray
from nums_tpu.models.decomposition import PCA
from nums_tpu.models.glms import LogisticRegression


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=400_000)
    parser.add_argument("--cols", type=int, default=64)
    parser.add_argument("--panel-rows", type=int, default=50_000)
    args = parser.parse_args(argv)
    n, d, pr = args.rows, args.cols, args.panel_rows

    app = nums_tpu.init()
    theta = np.linspace(-1.0, 1.0, d)

    # 1. Stream the dataset to disk, one panel at a time — it never
    #    exists as a whole array anywhere.
    def panels():
        rs = np.random.RandomState(0)
        for start in range(0, n, pr):
            rows = min(pr, n - start)
            yield (rs.randn(rows, d) * 2.0 + 0.5).astype(np.float32)

    t0 = time.time()
    dX = DiskArray.from_panels(
        "ooc_demo/X", app.fs, panels(), (n, d), np.float32, pr
    )
    print(f"wrote {dX.nbytes/1e9:.2f} GB to disk in {time.time()-t0:.1f}s "
          f"({dX.num_row_panels} panels)")

    # Labels stay host-resident (n floats is small even at huge n).
    rs = np.random.RandomState(1)
    logits = np.concatenate(
        [p @ theta for _, p in dX.iter_row_panels()]
    )
    y = (logits + rs.randn(n) > 0).astype(np.float64)

    # 2. Streamed stats + regression.
    t0 = time.time()
    G = app.gram_ooc(dX)
    mu = app.mean_ooc(dX)
    print(f"gram+mean: {time.time()-t0:.1f}s  "
          f"G[0,0]={float(G[0, 0].get()):.1f} mu[0]={float(mu[0].get()):.3f}")

    # 3. GLM training out-of-core via the normal fit() entry point.
    t0 = time.time()
    model = LogisticRegression(solver="newton", tol=1e-8, max_iter=8)
    model.fit(dX, y)
    pred = model.predict_ooc(dX, out="ooc_demo/pred")
    correct = 0
    for i in range(pred.num_row_panels):
        s, _ = dX.grid.grid_slices[0][i]
        p = pred.row_panel(i)
        correct += int((p == y[s:s + len(p)]).sum())
    print(f"OOC logistic fit+predict: {time.time()-t0:.1f}s  "
          f"accuracy={correct/n:.4f}")

    # 4. PCA and KMeans, also streamed.
    t0 = time.time()
    pca = PCA(n_components=4).fit(dX)
    proj = pca.transform(dX, out="ooc_demo/X_pca")
    print(f"OOC PCA fit+transform: {time.time()-t0:.1f}s  "
          f"ratio={np.round(pca.explained_variance_ratio_.get(), 4)}")

    from nums_tpu.models.cluster import KMeans

    t0 = time.time()
    km = KMeans(n_clusters=4, max_iter=20, seed=3).fit(proj)
    print(f"OOC KMeans on the projected data: {time.time()-t0:.1f}s  "
          f"inertia={km.inertia_:.1f}")

    for p in ("ooc_demo/X", "ooc_demo/pred", "ooc_demo/X_pca"):
        app.delete_fs(p)


if __name__ == "__main__":
    main()
