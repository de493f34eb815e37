"""Production-style training loop: scale → split → train with replicated
checkpoints → crash → resume → evaluate.

Shows the round-2 resilience subsystem end to end: every epoch saves a
replicated, CRC-checksummed checkpoint; a simulated crash corrupts a
block of the newest step; the "restarted" job verifies, routes around
the corruption (or falls back a version), and picks up where it left
off. The reference lists all of this as TODO
(``nums/core/systems/filesystem.py:217-222`` there).
"""

import numpy as np

import nums_tpu
from nums_tpu.core.io import checkpoint
from nums_tpu.models import metrics, model_selection, preprocessing
from nums_tpu.models.glms import LogisticRegression


CKPT = "example_prod_training"


def main():
    app = nums_tpu.init()
    rs = np.random.RandomState(0)
    n, d = 20_000, 16
    real_X = rs.randn(n, d) * rs.uniform(0.5, 4.0, d) + rs.randn(d)
    theta = rs.randn(d)
    real_y = (real_X @ theta + rs.randn(n) > 0).astype(np.float64)

    X = app.array(real_X, block_shape=(5_000, d))
    y = app.array(real_y, block_shape=(5_000,))

    # Scale, split (device-side gather; deterministic per seed).
    scaler = preprocessing.StandardScaler().fit(X)
    X_tr, X_te, y_tr, y_te = model_selection.train_test_split(
        scaler.transform(X), y, test_size=0.2, random_state=1
    )

    # "Epochs" = progressively longer fits; each epoch checkpoints the
    # coefficient vector with 2 replicas.
    checkpoint.delete(CKPT)
    model = LogisticRegression(solver="newton", tol=1e-9)
    for epoch, iters in enumerate((2, 4, 8)):
        model._max_iter = iters
        model.fit(X_tr, y_tr)
        beta = app.concatenate(
            [model.coef_, model.intercept_.reshape((1,), block_shape=(1,))],
            axis=0, axis_block_size=d + 1,
        )
        checkpoint.save(beta, CKPT, step=epoch, keep=2, replicas=2)
        acc = float(metrics.accuracy_score(
            y_te.astype(np.int64), model.predict(X_te)).get())
        print(f"epoch {epoch}: iters={iters} holdout acc={acc:.4f}")

    # Simulated crash: silently corrupt a block of the newest step.
    import os

    from nums_tpu.core import settings

    step_dir = os.path.join(settings.data_dir, CKPT, "step_2")
    victim = os.path.join(step_dir, "block_0.npy")
    np.save(victim, np.zeros(d + 1))
    print("corrupted", victim)

    # Restart: verified restore CRC-checks every block and routes around
    # the bad copy via its replica.
    step, beta = checkpoint.restore_latest(CKPT, verify=True)
    model2 = LogisticRegression(solver="newton", tol=1e-9)
    model2._beta = beta[:d]
    model2._beta0 = beta[d]
    acc = float(metrics.accuracy_score(
        y_te.astype(np.int64), model2.predict(X_te)).get())
    print(f"resumed from step {step} (next: {checkpoint.resume_step(CKPT)}); "
          f"restored holdout acc={acc:.4f}")
    scrub = app.verify_fs(os.path.join(CKPT, "step_2"), repair=True)
    print("scrub repaired:", scrub["repaired"] or "nothing")
    print("journal:", [(e, s) for _, e, s in checkpoint.journal(CKPT)][-4:])
    checkpoint.delete(CKPT)


if __name__ == "__main__":
    main()
