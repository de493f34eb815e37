"""Multi-host (multi-controller SPMD) end-to-end: 2 jax.distributed CPU
processes × 4 virtual devices each, one 8-device global mesh.

The reference's cluster execution is Ray tasks spanning nodes
(``nums/core/systems/systems.py:145-249``); here every host runs the
same program over a global mesh (gloo CPU collectives stand in for
ICI/DCN). The worker below exercises the full VERDICT r2 #1 checklist:
host-data creation, compute with a collective ``get``, checkpoint
write (each process writes only its addressable blocks) + restore,
``read_csv`` with per-process byte ranges, ``read_parquet`` with
per-process row groups, and the flagship GLM trained to the same
oracle result as a single-process run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]
nprocs = int(sys.argv[4])
local_dev = int(sys.argv[5])
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_dev}"
)
os.environ["NUMS_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["NUMS_TPU_NUM_PROCESSES"] = str(nprocs)
os.environ["NUMS_TPU_PROCESS_ID"] = str(pid)
os.environ["NUMS_TPU_BACKEND"] = "mesh"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import numpy as np
import nums_tpu
from nums_tpu.core import multiprocess as mp
from nums_tpu.core import settings
settings.backend_name = "mesh"

app = nums_tpu.init()
assert jax.process_count() == nprocs, jax.process_count()
assert app.backend.num_devices == 8, app.backend.num_devices

# 1. Host-data creation + compute + collective get.
rs = np.random.RandomState(0)
a_np = rs.randn(32, 8)
A = app.array(a_np, block_shape=(4, 8))
G = (A.T @ A).get()
assert np.allclose(G, a_np.T @ a_np), "gram oracle"
assert np.isclose(float((A * 2.0).sum().get()), 2.0 * a_np.sum())

# 2. Checkpoint: each process writes only its addressable blocks.
ckpt = os.path.join(outdir, "ckpt_arr")
app.write_fs(A, ckpt)
meta_blocks = [f for f in os.listdir(ckpt) if f.startswith("block_")]
assert len(meta_blocks) == 8, meta_blocks  # one block per device shard
back = app.read_fs(ckpt)
assert np.allclose(back.get(), a_np), "checkpoint roundtrip"
# ragged shape too (pad-and-mask at-rest buffers must restore exactly)
R = app.array(rs.randn(13, 3), block_shape=(4, 3))
app.write_fs(R, os.path.join(outdir, "ckpt_ragged"))
host_r = R.get()
assert np.allclose(
    app.read_fs(os.path.join(outdir, "ckpt_ragged")).get(), host_r
), "ragged checkpoint roundtrip"
# Lazily-transposed array: the writer canonicalizes to the at-rest
# layout (materialize + repad) before carving shard blocks.
app.write_fs(A.T, os.path.join(outdir, "ckpt_t"))
assert np.allclose(
    app.read_fs(os.path.join(outdir, "ckpt_t")).get(), a_np.T
), "transposed checkpoint roundtrip"
# 3-D: the shard-grid writer is N-d generic
T3 = app.array(rs.randn(8, 6, 4), block_shape=(2, 6, 4))
host3 = T3.get()
app.write_fs(T3, os.path.join(outdir, "ckpt_3d"))
assert np.allclose(
    app.read_fs(os.path.join(outdir, "ckpt_3d")).get(), host3
), "3-D checkpoint roundtrip"

# 2b. Replicated write + corruption failover across processes: the
# corrupted primary block belongs to some process's shard; that
# process must fail over to the replica copy during its region load.
ckpt2 = os.path.join(outdir, "ckpt_repl")
app.write_fs(A, ckpt2, replicas=2)
mp.barrier("pre-corrupt")
if pid == nprocs - 1:  # cross-process: last process corrupts
    import glob as _glob
    victim = sorted(_glob.glob(os.path.join(ckpt2, "block_*.npy")))[3]
    with open(victim, "r+b") as f:
        f.seek(16)
        f.write(b"\xde\xad\xbe\xef" * 8)
mp.barrier("post-corrupt")
assert np.allclose(app.read_fs(ckpt2, verify=True).get(), a_np), \
    "replica failover under multi-process"
# Collective self-heal: process 0 scrubs, every process receives the
# SAME report via the shared-FS sidecar (no P-fold re-scrub).
report = app.fs.verify_fs(ckpt2, repair=True)
assert report["repaired"], report
assert not report["unrecoverable"], report
assert app.fs.verify_fs(ckpt2)["ok"]  # post-heal: all copies intact

# 2c. S3 (file-backed fake = one "cloud" shared by the processes):
# each process puts only its shard objects; restore is O(shard).
os.environ["NUMS_TPU_FAKE_S3_DIR"] = os.path.join(outdir, "fake_s3")
app.fs._s3_client().create_bucket("bkt")
import nums_tpu as _nt
_nt.write(A, "s3://bkt/arr")
assert np.allclose(_nt.read("s3://bkt/arr").get(), a_np), "s3 roundtrip"

# 3. read_csv: byte ranges split across processes.
csv_path = os.path.join(outdir, "data.csv")
X_csv = nums_tpu.read_csv(csv_path, has_header=True)
want_csv = np.loadtxt(csv_path, delimiter=",", skiprows=1, ndmin=2)
assert X_csv.shape == want_csv.shape, (X_csv.shape, want_csv.shape)
assert np.allclose(X_csv.get(), want_csv), "read_csv oracle"

# 4. read_parquet: row groups split across processes.
try:
    import pyarrow  # noqa: F401
    pq_path = os.path.join(outdir, "data.parquet")
    X_pq = nums_tpu.read_parquet(pq_path)
    assert np.allclose(X_pq.get(), want_csv), "read_parquet oracle"
except ImportError:
    pass

# 5. Flagship GLM to the oracle result.
from nums_tpu.core.io.datasets import BimodalGaussian
from nums_tpu.models.glms import LogisticRegression

real_X, real_y = BimodalGaussian.get_dataset(160, 4)
X = app.array(real_X, block_shape=(20, 4))
y = app.array(real_y, block_shape=(20,))
m = LogisticRegression(solver="newton", tol=1e-8, max_iter=10)
m.fit(X, y)
beta = np.concatenate(
    [np.atleast_1d(np.asarray(m._beta0.get())),
     np.asarray(m._beta.get()).ravel()]
)
np.save(os.path.join(outdir, f"beta_{pid}.npy"), beta)
acc = float((m.predict(X).get() == real_y).mean())
assert acc > 0.9, acc

# 6. Out-of-core under multi-controller (VERDICT r3 #1): panels stream
# with each process reading only its addressable rows (PanelRef) and
# mesh-replicated accumulators; results must match host oracles.
ooc_np = rs.randn(37, 6)  # ragged rows: pad masking in every kernel
Xo = app.array(ooc_np, block_shape=(5, 6))
da = app.spill(Xo, os.path.join(outdir, "ooc_X"))
assert np.allclose(app.gram_ooc(da).get(), ooc_np.T @ ooc_np), "gram_ooc"
assert np.allclose(app.sum_ooc(da).get(), ooc_np.sum(axis=0)), "sum_ooc"
assert np.allclose(app.max_ooc(da).get(), ooc_np.max(axis=0)), "max_ooc"
R_ooc = app.tsqr_r_ooc(da).get()
assert np.allclose(R_ooc.T @ R_ooc, ooc_np.T @ ooc_np, atol=1e-8), "tsqr_r_ooc"
w_true = rs.randn(6)
y_lin = ooc_np @ w_true
theta = app.linear_regression_ooc(da, y_lin).get()
assert np.allclose(theta, w_true, atol=1e-6), "linear_regression_ooc"

# OOC Newton GLM: same oracle beta as the in-core multi-process fit.
Xd = app.spill(X, os.path.join(outdir, "ooc_glm"))
m_ooc = LogisticRegression(solver="newton", tol=1e-8, max_iter=10)
m_ooc.fit(Xd, real_y)
beta_ooc = np.concatenate(
    [np.atleast_1d(np.asarray(m_ooc._beta0.get())),
     np.asarray(m_ooc._beta.get()).ravel()]
)
np.save(os.path.join(outdir, f"beta_ooc_{pid}.npy"), beta_ooc)
# Collective DiskArray writer: all processes drain the (collective)
# panel stream, process 0 writes, everyone opens the result.
pred = m_ooc.predict_ooc(Xd, out=os.path.join(outdir, "ooc_pred"))
lab = np.concatenate(
    [pred.row_panel(i) for i in range(pred.num_row_panels)]
)
assert float(((lab > 0.5) == real_y).mean()) > 0.9, "predict_ooc"

# Streamed KMeans + PCA ride the same machinery.
from nums_tpu.models.cluster import KMeans
km = KMeans(n_clusters=2, max_iter=5, seed=3)
km.fit(da)
assert km.cluster_centers_.shape == (2, 6)
centers_host = np.asarray(km.cluster_centers_.get())
np.save(os.path.join(outdir, f"km_centers_{pid}.npy"), centers_host)
from nums_tpu.models.decomposition import PCA
pca = PCA(n_components=2)
pca.fit(da)
evr = np.asarray(pca.explained_variance_ratio_)
assert evr.shape == (2,) and np.all(evr >= 0), evr

# 7. Linalg + autodiff across real processes (VERDICT r3 #5): ragged
# TSQR/QR/SVD and a value_and_grad step against host oracles.
tall = rs.randn(37, 3)
Xt = app.array(tall, block_shape=(5, 3))
Rt = app.indirect_tsr(Xt).get()
assert np.allclose(Rt.T @ Rt, tall.T @ tall, atol=1e-8), "indirect_tsr"
Qb, Rb = app.qr(Xt)
qh, rh = Qb.get(), Rb.get()
assert np.allclose(qh @ rh, tall, atol=1e-8), "qr reconstruct"
assert np.allclose(qh.T @ qh, np.eye(3), atol=1e-8), "qr orthogonal"
U, S, VT = app.svd(Xt)
assert np.allclose(
    S.get(), np.linalg.svd(tall, compute_uv=False), atol=1e-8
), "svd singular values"
assert np.allclose(
    U.get() @ np.diag(S.get()) @ VT.get(), tall, atol=1e-8
), "svd reconstruct"

from nums_tpu import autodiff
w0 = app.array(rs.randn(4), block_shape=(4,))
def loss(w):
    r = X @ w - y
    return (r * r).sum()
val, gw = autodiff.value_and_grad(loss)(w0)
w_host = np.asarray(w0.get())
r_host = real_X @ w_host - real_y
assert np.isclose(float(val.get()), float(r_host @ r_host)), "ad value"
g_host = 2.0 * real_X.T @ r_host
assert np.allclose(np.asarray(gw.get()), g_host, atol=1e-8), "ad grad"

mp.barrier("done")
print(f"WORKER_{pid}_OK", flush=True)
"""


@pytest.mark.parametrize(
    "nprocs,local_dev",
    [
        (2, 4),
        (4, 2),
        # Every shard on a DIFFERENT process — the extreme owner-dedup
        # case; slow tier (8 jax runtimes on a 1-CPU host).
        pytest.param(8, 1, marks=pytest.mark.slow),
    ],
)
def test_multi_process_mesh_e2e(tmp_path, nprocs, local_dev):
    # Input files written by the parent (the "shared filesystem").
    rs = np.random.RandomState(7)
    table = rs.randn(37, 5)
    csv_path = tmp_path / "data.csv"
    with open(csv_path, "w") as f:
        f.write(",".join(f"c{i}" for i in range(5)) + "\n")
        for i, row in enumerate(table):
            f.write(",".join(repr(float(v)) for v in row) + "\n")
            if i == 17:
                f.write("\n")  # interior blank line: not a data row
        f.write("\n")  # trailing extra newline: not a data row either
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = {f"c{i}": table[:, i] for i in range(5)}
        pq.write_table(
            pa.table(cols), tmp_path / "data.parquet", row_group_size=10
        )
    except ImportError:
        pass

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    import socket

    with socket.socket() as s:  # ephemeral port: no pid-collision flake
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    # `python /tmp/.../worker.py` puts the WORKER's directory on
    # sys.path, not the cwd — without an editable install (fresh
    # container) the import fails; point the workers at the repo.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    # Workers log to files (PIPE + sequential communicate can deadlock:
    # a later worker blocking on a full pipe stalls a barrier the
    # earlier worker is waiting in).
    logs = [open(tmp_path / f"worker_{pid}.log", "w+")
            for pid in range(nprocs)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port, str(tmp_path),
             str(nprocs), str(local_dev)],
            stdout=logs[pid], stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for pid in range(nprocs)
    ]
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = []
    for f in logs:
        f.seek(0)
        outs.append(f.read())
        f.close()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_{pid}_OK" in out, out[-2000:]

    # Same oracle result on EVERY process AND as a single-process run.
    b0 = np.load(tmp_path / "beta_0.npy")
    for pid in range(1, nprocs):
        assert np.allclose(b0, np.load(tmp_path / f"beta_{pid}.npy")), pid
    # The OOC Newton fit converges to the same beta as the in-core fit,
    # identically on every process.
    b_ooc = np.load(tmp_path / "beta_ooc_0.npy")
    assert np.allclose(b_ooc, b0, atol=1e-6), (
        np.abs(b_ooc - b0).max(), "OOC multi-host fit drifted from in-core"
    )
    km0 = np.load(tmp_path / "km_centers_0.npy")
    for pid in range(1, nprocs):
        assert np.allclose(
            b_ooc, np.load(tmp_path / f"beta_ooc_{pid}.npy")
        ), pid
        assert np.allclose(
            km0, np.load(tmp_path / f"km_centers_{pid}.npy")
        ), pid
    from nums_tpu.core import application_manager, settings

    settings.backend_name = "serial"
    application_manager.destroy()
    app = application_manager.create()
    try:
        from nums_tpu.core.io.datasets import BimodalGaussian
        from nums_tpu.models.glms import LogisticRegression

        real_X, real_y = BimodalGaussian.get_dataset(160, 4)
        X = app.array(real_X, block_shape=(20, 4))
        y = app.array(real_y, block_shape=(20,))
        m = LogisticRegression(solver="newton", tol=1e-8, max_iter=10)
        m.fit(X, y)
        ref = np.concatenate(
            [np.atleast_1d(np.asarray(m._beta0.get())),
             np.asarray(m._beta.get()).ravel()]
        )
        assert np.allclose(b0, ref, atol=1e-6), (
            np.abs(b0 - ref).max(), "multi-host GLM drifted from the "
            "single-process oracle"
        )
        # The multi-host checkpoint restores in a single-process app.
        back = app.read_fs(str(tmp_path / "ckpt_arr"))
        assert np.allclose(back.get(), np.random.RandomState(0).randn(32, 8))
    finally:
        application_manager.destroy()
