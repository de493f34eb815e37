"""Top-level I/O verbs (parity: ``nums/api.py:23-71``)."""

from nums_tpu.core.application_manager import instance as _instance


def _is_s3(filename: str) -> bool:
    return filename.startswith("s3://")


def read(filename: str):
    """Read a persisted BlockArray; ``s3://`` prefix dispatches to S3."""
    if _is_s3(filename):
        return _instance().read_s3(filename[len("s3://"):])
    return _instance().read_fs(filename)


def write(ba, filename: str):
    if _is_s3(filename):
        return _instance().write_s3(ba, filename[len("s3://"):])
    return _instance().write_fs(ba, filename)


def delete(filename: str):
    if _is_s3(filename):
        return _instance().delete_s3(filename[len("s3://"):])
    return _instance().delete_fs(filename)


def read_csv(filename, dtype=float, delimiter=",", has_header=False,
             num_workers=None):
    return _instance().read_csv(
        filename, dtype=dtype, delimiter=delimiter, has_header=has_header,
        num_workers=num_workers,
    )


def _parquet_row_groups(pf, columns, dtype):
    assert pf.num_row_groups > 0, "parquet file has no row groups"
    for i in range(pf.num_row_groups):
        arr = pf.read_row_group(i, columns=columns).to_pandas().to_numpy()
        if dtype is not None:
            arr = arr.astype(dtype)
        yield arr


def _rechunk(panels, rows_per_panel):
    """Re-slice a stream of row panels into exact ``rows_per_panel``
    chunks (last ragged) — O(one output panel) buffered."""
    import numpy as np

    assert rows_per_panel > 0, rows_per_panel
    buf = []
    have = 0
    for p in panels:
        buf.append(p)
        have += p.shape[0]
        while have >= rows_per_panel:
            cat = np.concatenate(buf, axis=0) if len(buf) > 1 else buf[0]
            yield cat[:rows_per_panel]
            rest = cat[rows_per_panel:]
            buf = [rest] if rest.shape[0] else []
            have = rest.shape[0]
    if have:
        yield np.concatenate(buf, axis=0) if len(buf) > 1 else buf[0]


def read_parquet(filename, columns=None, dtype=None, out=None,
                 block_rows=None):
    """Parquet file → BlockArray (beyond the reference's CSV/S3/npy).

    Row groups are read one at a time and assembled region-wise into
    the sharded array (the same partition-streamed path the pandas/
    modin bridge uses). ``block_rows`` sets the row blocking. With
    ``out=<path>`` the groups stream straight to a DiskArray on disk
    instead — OUT-OF-CORE ingestion: peak host memory is one row group
    + one block, so the file size is bounded by disk, not RAM/HBM.
    Requires pyarrow.
    """
    import numpy as np
    import pyarrow.parquet as pq

    if block_rows is not None:
        assert block_rows > 0, block_rows
    pf = pq.ParquetFile(filename)
    if out is not None:
        from nums_tpu.core import multiprocess as _mp

        if _mp.is_multiprocess():
            # COLLECTIVE: the DiskArray lands on the shared FS once
            # (process 0 streams it); every other process opens it
            # after the barrier — concurrent writers to the same block
            # files would tear the checkpoint. Failure-release protocol
            # (marker + barrier ordering): multiprocess.publishing.
            marker = f"{out}.ingest-failed"
            tag = f"read_parquet:out:{out}"
            if _mp.process_index() == 0:
                with _mp.publishing(tag, marker):
                    return _read_parquet_ooc(pf, columns, dtype, out,
                                             block_rows)
            _mp.await_published(tag, marker, f"read_parquet(out={out!r})")
            return _instance().open_fs(out)
        return _read_parquet_ooc(pf, columns, dtype, out, block_rows)
    from nums_tpu.core import multiprocess as _mp

    if _mp.is_multiprocess():
        return _read_parquet_multiprocess(
            pf, columns, dtype, block_rows
        )
    from nums_tpu.experimental.nums_modin import _from_row_parts

    parts = list(_parquet_row_groups(pf, columns, dtype))
    block_shape = (
        (block_rows, parts[0].shape[1]) if block_rows is not None else None
    )
    return _from_row_parts(parts, dtype=dtype, block_shape=block_shape)


def _read_parquet_ooc(pf, columns, dtype, out, block_rows):
    """Stream row groups straight to a DiskArray at ``out``.

    Width/dtype come from the DECODED first group (schema-based
    inference breaks on pandas index columns and on nullable ints that
    decode to float64) — the stream resumes after it, so no group is
    decoded twice.
    """
    import numpy as np

    from nums_tpu.core.array.diskarray import DiskArray

    n = pf.metadata.num_rows
    groups = _parquet_row_groups(pf, columns, dtype)
    first = next(groups)
    d = first.shape[1]
    out_dtype = np.dtype(dtype) if dtype is not None else first.dtype
    if block_rows is None:
        block_rows = max(1, min(n, first.shape[0]))
    app = _instance()

    def panels():
        yield first
        yield from groups  # continues from row group 1

    return DiskArray.from_panels(
        out, app.fs, _rechunk(panels(), block_rows), (n, d),
        out_dtype, block_rows,
    )


def _read_parquet_multiprocess(pf, columns, dtype, block_rows):
    """Multi-controller Parquet ingestion (COLLECTIVE; shared FS): each
    process decodes ONLY the row groups overlapping its addressable
    shards (group boundaries come from the file metadata, so no group
    is decoded twice and none is decoded by a process that doesn't
    need it). Group 0 is decoded everywhere to fix width/dtype —
    schema-based inference breaks on pandas index columns."""
    import jax
    import numpy as np

    from nums_tpu.core.array.blockarray import BlockArray
    from nums_tpu.core.grid import ArrayGrid

    app = _instance()
    backend = app.backend
    n = pf.metadata.num_rows
    group_rows = [
        pf.metadata.row_group(i).num_rows for i in range(pf.num_row_groups)
    ]
    starts = np.concatenate([[0], np.cumsum(group_rows)])

    def decode(i):
        arr = pf.read_row_group(i, columns=columns).to_pandas().to_numpy()
        return arr.astype(dtype) if dtype is not None else arr

    first = decode(0)
    d = first.shape[1]
    out_dtype = np.dtype(dtype) if dtype is not None else first.dtype
    rows_per_block = block_rows or max(1, n // max(1, backend.num_devices))
    grid = ArrayGrid((n, d), (min(rows_per_block, n), d), out_dtype.name)
    sharding = backend.sharding_for_grid(grid)
    pshape = backend.physical_shape(grid.shape, grid.grid_shape)

    def fill_rows(r0, rr1, c0, cc1, out):
        g0 = int(np.searchsorted(starts, r0, side="right")) - 1
        for g in range(max(0, g0), len(group_rows)):
            if starts[g] >= rr1:
                break
            arr = first if g == 0 else decode(g)
            lo, hi = max(r0, int(starts[g])), min(rr1, int(starts[g + 1]))
            if lo >= hi:
                continue
            out[lo - r0:hi - r0, : cc1 - c0] = arr[
                lo - starts[g]:hi - starts[g], c0:cc1
            ].astype(out_dtype, copy=False)

    from nums_tpu.core.io.filesystem import row_region_loader

    load_region = row_region_loader(pshape, (n, d), out_dtype, fill_rows)
    data = jax.make_array_from_callback(pshape, sharding, load_region)
    return BlockArray(data, grid, backend)


def write_parquet(ba, filename: str, column_names=None,
                  row_group_rows: int = None):
    """BlockArray (or DiskArray) → Parquet file, one row group per row
    stripe (fetched block-batch-at-a-time: O(stripe) host memory)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nums_tpu.core.array.diskarray import DiskArray

    assert ba.ndim == 2, ba.shape
    d = ba.shape[1]
    names = (
        list(column_names) if column_names is not None
        else [f"c{i}" for i in range(d)]
    )
    assert len(names) == d, (len(names), d)
    if row_group_rows is not None:
        assert row_group_rows > 0, row_group_rows
    np_dtype = ba.dtype

    from nums_tpu.core import multiprocess as _mp

    multi = _mp.is_multiprocess()
    marker = f"{filename}.write-failed"
    tag = f"write_parquet:{filename}"
    what = f"write_parquet({filename!r})"
    if isinstance(ba, DiskArray):
        if multi and _mp.process_index() != 0:
            # Host-pure producer (shared-FS panel reads, no collectives):
            # peers skip straight to the release barrier + marker check.
            _mp.await_published(tag, marker, what)
            return
        stripes = (p for _, p in ba.iter_row_panels())
        if row_group_rows is not None:
            stripes = _rechunk(stripes, int(row_group_rows))
    else:
        rows = row_group_rows or max(1, ba.block_shape[0])

        def gen():
            # One logical view up front: slicing `ba` per stripe would
            # re-slice the whole padded buffer each time (quadratic).
            data = ba.data
            for start in range(0, ba.shape[0], rows):
                sl = data[start:start + rows]
                # Collective fetch under multi-controller (np.asarray of
                # a global array faults); every process yields the
                # stripe, only process 0 writes it.
                yield (
                    _mp.allgather_to_host(sl) if multi else np.asarray(sl)
                )

        stripes = gen()
    write = not multi or _mp.process_index() == 0
    # The stream is collective ONLY for the in-memory branch
    # (allgather_to_host per stripe): there every process iterates in
    # lockstep, so a write failure must DRAIN the remainder or the
    # peers strand inside the producer before the release barrier.
    # DiskArray stripes are host-pure shared-FS reads that the peers
    # never touch (they wait at await_published) — nothing to drain.
    collective_stream = multi and not isinstance(ba, DiskArray)

    def write_stream():
        writer = None
        write_exc = None
        try:
            for stripe in stripes:
                if write_exc is not None:
                    if not collective_stream:
                        # Nothing collective to drain — surface the
                        # failure now instead of paying the remaining
                        # stream reads first.
                        break
                    continue
                try:
                    table = pa.table(
                        {nm: stripe[:, j] for j, nm in enumerate(names)}
                    )
                    if writer is None:
                        writer = pq.ParquetWriter(filename, table.schema)
                    writer.write_table(table)
                except BaseException as e:  # noqa: BLE001 - raised below
                    write_exc = e
            if write_exc is not None:
                raise write_exc
            if writer is None:  # zero rows: still a valid file
                empty = pa.table(
                    {nm: np.empty(0, np_dtype) for nm in names}
                )
                writer = pq.ParquetWriter(filename, empty.schema)
                writer.write_table(empty)
        finally:
            if writer is not None:
                writer.close()

    if not multi:
        write_stream()
        return
    if write:
        # Process 0: marker lifecycle + release-barrier ordering live
        # in multiprocess.publishing.
        with _mp.publishing(tag, marker):
            write_stream()
        return
    # Peers with a collective stripe producer: drain the whole stream
    # in lockstep, reach the release barrier even when the producer
    # itself failed (process 0 is waiting there), then surface this
    # process's own failure before the marker check.
    try:
        for _ in stripes:
            pass
    except BaseException:
        _mp.barrier(tag)
        raise
    _mp.await_published(tag, marker, what)
