"""In-process fake S3 client (moto-equivalent for this image).

The reference validates its S3 path against moto's ``@mock_s3``
(``/root/reference/tests/core/storage/test_s3.py``,
``tests/test_api.py:49-74``). Neither boto3 nor moto is available in
this image, so this module provides a minimal dict-backed client with
the same call surface ``FileSystem`` uses (put_object / get_object /
delete_objects / create_bucket / list_objects_v2). Enabled via
``NUMS_TPU_FAKE_S3=1`` or by injecting ``set_client_factory`` — never
silently substituted for real S3.
"""

import threading


class NoSuchKey(Exception):
    pass


class NoSuchBucket(Exception):
    pass


class _Body:
    def __init__(self, data: bytes):
        self._data = data

    def read(self):
        return self._data


class FakeS3Client:
    """Minimal boto3-client-compatible S3 stub over a shared dict store."""

    # One global store: all clients in the process see the same "cloud",
    # matching how separate boto3 clients see one region.
    _store = {}
    _lock = threading.Lock()

    # boto3 surfaces client exceptions as attributes.
    class exceptions:
        NoSuchKey = NoSuchKey
        NoSuchBucket = NoSuchBucket

    def create_bucket(self, Bucket):
        with self._lock:
            self._store.setdefault(Bucket, {})
        return {"Location": f"/{Bucket}"}

    def _bucket(self, name):
        # Auto-create on write paths for test ergonomics is NOT done:
        # missing buckets raise, like real S3.
        try:
            return self._store[name]
        except KeyError:
            raise NoSuchBucket(name)

    def put_object(self, Bucket, Key, Body):
        if isinstance(Body, str):
            Body = Body.encode()
        with self._lock:
            self._bucket(Bucket)[Key] = bytes(Body)
        return {"ETag": str(hash(Body))}

    def get_object(self, Bucket, Key):
        with self._lock:
            bucket = self._bucket(Bucket)
            try:
                data = bucket[Key]
            except KeyError:
                raise NoSuchKey(Key)
        return {"Body": _Body(data)}

    def delete_object(self, Bucket, Key):
        with self._lock:
            self._bucket(Bucket).pop(Key, None)
        return {}

    def delete_objects(self, Bucket, Delete):
        with self._lock:
            bucket = self._bucket(Bucket)
            deleted = []
            for obj in Delete.get("Objects", []):
                if bucket.pop(obj["Key"], None) is not None:
                    deleted.append({"Key": obj["Key"]})
        return {"Deleted": deleted}

    def list_objects_v2(self, Bucket, Prefix=""):
        with self._lock:
            keys = sorted(
                k for k in self._bucket(Bucket) if k.startswith(Prefix)
            )
        return {
            "KeyCount": len(keys),
            "Contents": [{"Key": k} for k in keys],
        }

    @classmethod
    def reset(cls):
        with cls._lock:
            cls._store.clear()


class FileBackedFakeS3Client(FakeS3Client):
    """Fake S3 persisted under a directory (``NUMS_TPU_FAKE_S3_DIR``).

    Objects are files at ``<root>/<bucket>/<quoted-key>``, so SEPARATE
    PROCESSES sharing the directory see one "cloud" — the harness the
    multi-host S3 path is validated against (the in-memory fake is
    process-local). Keys are URL-quoted for filesystem safety; puts are
    atomic per object (tmp + rename), matching S3's per-key atomicity.
    """

    def __init__(self, root: str):
        import os

        self._root = root
        os.makedirs(root, exist_ok=True)

    def _bpath(self, bucket):
        import os

        p = os.path.join(self._root, bucket)
        if not os.path.isdir(p):
            raise NoSuchBucket(bucket)
        return p

    def _kpath(self, bucket, key):
        import os
        from urllib.parse import quote

        return os.path.join(self._bpath(bucket), quote(key, safe=""))

    def create_bucket(self, Bucket):
        import os

        os.makedirs(os.path.join(self._root, Bucket), exist_ok=True)
        return {"Location": f"/{Bucket}"}

    def put_object(self, Bucket, Key, Body):
        import os

        if isinstance(Body, str):
            Body = Body.encode()
        path = self._kpath(Bucket, Key)
        # Temp names start with '#', which quote(key) can never produce
        # (real keys quote '#' to %23) — in-flight/orphaned temps are
        # thus invisible to listings, preserving per-key atomicity.
        tmp = os.path.join(
            os.path.dirname(path),
            f"#tmp-{os.getpid()}-{os.path.basename(path)}",
        )
        with open(tmp, "wb") as f:
            f.write(bytes(Body))
        os.replace(tmp, path)
        return {"ETag": str(hash(bytes(Body)))}

    def get_object(self, Bucket, Key):
        try:
            with open(self._kpath(Bucket, Key), "rb") as f:
                return {"Body": _Body(f.read())}
        except FileNotFoundError:
            raise NoSuchKey(Key)

    def delete_object(self, Bucket, Key):
        import os

        try:
            os.remove(self._kpath(Bucket, Key))
        except FileNotFoundError:
            pass
        return {}

    def delete_objects(self, Bucket, Delete):
        import os

        deleted = []
        for obj in Delete.get("Objects", []):
            try:
                os.remove(self._kpath(Bucket, obj["Key"]))
                deleted.append({"Key": obj["Key"]})
            except FileNotFoundError:
                pass
        return {"Deleted": deleted}

    def list_objects_v2(self, Bucket, Prefix=""):
        import os
        from urllib.parse import unquote

        keys = sorted(
            unquote(f) for f in os.listdir(self._bpath(Bucket))
            if not f.startswith("#") and unquote(f).startswith(Prefix)
        )
        return {
            "KeyCount": len(keys),
            "Contents": [{"Key": k} for k in keys],
        }

    def reset(self):  # instance-level: clears THIS root's objects
        import os
        import shutil

        for entry in os.listdir(self._root):
            shutil.rmtree(os.path.join(self._root, entry),
                          ignore_errors=True)
