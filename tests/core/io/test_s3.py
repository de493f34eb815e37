"""End-to-end S3 persistence against the in-process fake client.

Reference parity: ``tests/core/storage/test_s3.py`` + the mocked-S3 API
round trip in ``tests/test_api.py:49-74`` (moto's @mock_s3 there; the
dict-backed fake here — same call surface, no network).
"""

import numpy as np
import pytest

from nums_tpu.core.io.fake_s3 import FakeS3Client, NoSuchBucket, NoSuchKey
from nums_tpu.core.io.filesystem import FileSystem


@pytest.fixture(autouse=True)
def fake_s3():
    FakeS3Client.reset()
    FileSystem.s3_client_factory = FakeS3Client
    client = FakeS3Client()
    client.create_bucket(Bucket="darrays")
    yield client
    FileSystem.s3_client_factory = None
    FakeS3Client.reset()


def test_fake_client_semantics(fake_s3):
    fake_s3.put_object(Bucket="darrays", Key="k1", Body=b"abc")
    assert fake_s3.get_object(Bucket="darrays", Key="k1")["Body"].read() == b"abc"
    with pytest.raises(NoSuchKey):
        fake_s3.get_object(Bucket="darrays", Key="missing")
    with pytest.raises(NoSuchBucket):
        fake_s3.put_object(Bucket="nope", Key="k", Body=b"x")
    fake_s3.delete_objects(
        Bucket="darrays", Delete={"Objects": [{"Key": "k1"}]}
    )
    assert fake_s3.list_objects_v2(Bucket="darrays")["KeyCount"] == 0


@pytest.mark.parametrize("shape,block", [((16, 8), (4, 8)), ((1003, 7), (126, 7))])
def test_s3_roundtrip(app_inst, shape, block):
    rs = np.random.RandomState(0)
    x = rs.randn(*shape)
    bx = app_inst.array(x, block_shape=block)
    app_inst.write_s3(bx, "darrays/foo/arr")
    back = app_inst.read_s3("darrays/foo/arr")
    assert back.shape == tuple(shape)
    assert back.grid.block_shape == bx.grid.block_shape
    assert np.allclose(back.get(), x)
    app_inst.delete_s3("darrays/foo/arr")
    client = FakeS3Client()
    assert client.list_objects_v2(Bucket="darrays", Prefix="foo/")["KeyCount"] == 0


def test_s3_read_is_region_scoped(app_inst, fake_s3):
    """O(shard) property: each stored block object is fetched at most
    once per overlapping shard — never the whole array per shard."""
    fetched = []
    real_get = fake_s3.get_object

    class CountingClient(FakeS3Client):
        def get_object(self, Bucket, Key):
            fetched.append(Key)
            return real_get(Bucket=Bucket, Key=Key)

    x = np.arange(64, dtype=float).reshape(16, 4)
    bx = app_inst.array(x, block_shape=(2, 4))  # 8 row-blocks
    app_inst.write_s3(bx, "darrays/counting")
    FileSystem.s3_client_factory = CountingClient
    try:
        back = app_inst.read_s3("darrays/counting")
        assert np.allclose(back.get(), x)
    finally:
        FileSystem.s3_client_factory = FakeS3Client
    block_fetches = [k for k in fetched if not k.endswith("_meta")]
    n_devices = app_inst.backend.num_devices
    # every block fetched, and no shard pulled blocks it doesn't overlap
    assert len(set(block_fetches)) == 8
    assert len(block_fetches) <= 8 * max(1, n_devices)


def test_public_api_s3_dispatch(nps_app_inst):
    import nums_tpu
    import nums_tpu.numpy as nps

    x = np.arange(24, dtype=float).reshape(6, 4)
    ba = nps.array(x)
    nums_tpu.write(ba, "s3://darrays/api/arr")
    back = nums_tpu.read("s3://darrays/api/arr")
    assert np.allclose(back.get(), x)
    nums_tpu.delete("s3://darrays/api/arr")


def test_file_backed_fake_client_semantics(tmp_path):
    """The file-backed fake (the multi-host harness: separate processes
    share one 'cloud' directory) — exercised in-process: bucket/key
    errors, per-key atomic puts with listing-invisible temps, prefix
    listing with quoted keys, delete batches, reset."""
    from nums_tpu.core.io.fake_s3 import (
        FileBackedFakeS3Client, NoSuchBucket, NoSuchKey,
    )

    c = FileBackedFakeS3Client(str(tmp_path / "cloud"))
    with pytest.raises(NoSuchBucket):
        c.put_object(Bucket="nope", Key="k", Body=b"x")
    c.create_bucket(Bucket="b")
    c.create_bucket(Bucket="b")  # idempotent
    c.put_object(Bucket="b", Key="dir/a#1", Body="text")  # str + quoting
    c.put_object(Bucket="b", Key="dir/a#2", Body=b"\x00\x01")
    c.put_object(Bucket="b", Key="other", Body=b"z")
    assert c.get_object(Bucket="b", Key="dir/a#1")["Body"].read() == b"text"
    with pytest.raises(NoSuchKey):
        c.get_object(Bucket="b", Key="missing")
    ls = c.list_objects_v2(Bucket="b", Prefix="dir/")
    assert [o["Key"] for o in ls["Contents"]] == ["dir/a#1", "dir/a#2"]
    # A second client on the same root sees the same cloud (the
    # cross-process property, emulated in-process).
    c2 = FileBackedFakeS3Client(str(tmp_path / "cloud"))
    assert c2.get_object(Bucket="b", Key="other")["Body"].read() == b"z"
    # Orphaned temp files are invisible to listings.
    (tmp_path / "cloud" / "b" / "#tmp-999-orphan").write_bytes(b"junk")
    assert c.list_objects_v2(Bucket="b")["KeyCount"] == 3
    c.delete_object(Bucket="b", Key="other")
    c.delete_object(Bucket="b", Key="other")  # absent: no error
    out = c.delete_objects(
        Bucket="b",
        Delete={"Objects": [{"Key": "dir/a#1"}, {"Key": "gone"}]},
    )
    assert [d["Key"] for d in out["Deleted"]] == ["dir/a#1"]
    assert c.list_objects_v2(Bucket="b")["KeyCount"] == 1
    c.reset()
    with pytest.raises(NoSuchBucket):
        c.list_objects_v2(Bucket="b")


def test_file_backed_fake_e2e_roundtrip(app_inst, tmp_path, monkeypatch):
    """write_s3/read_s3/delete_s3 against the file-backed fake via
    NUMS_TPU_FAKE_S3_DIR — the exact client the multihost e2e uses."""
    monkeypatch.setenv("NUMS_TPU_FAKE_S3_DIR", str(tmp_path / "cloud"))
    FileSystem.s3_client_factory = None  # env-based selection
    try:
        from nums_tpu.core.io.fake_s3 import FileBackedFakeS3Client

        FileBackedFakeS3Client(str(tmp_path / "cloud")).create_bucket(
            Bucket="darrays"
        )
        x = np.arange(60, dtype=float).reshape(15, 4)
        bx = app_inst.array(x, block_shape=(4, 4))
        app_inst.write_s3(bx, "darrays/filefake/arr")
        back = app_inst.read_s3("darrays/filefake/arr")
        assert np.allclose(back.get(), x)
        app_inst.delete_s3("darrays/filefake/arr")
        with pytest.raises(Exception):
            app_inst.read_s3("darrays/filefake/arr")
    finally:
        FileSystem.s3_client_factory = None
