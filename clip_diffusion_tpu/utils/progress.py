"""Progress reporting + artifact publishing.

The reference streams progress to its web client by writing keys into
Anvil's background-task state (`new_prompt`, `current_batch`,
`current_step`, `current_result`, `current_iteration`; reference
functional.py:177-179, sample.py:95,280-311,436) and uploading intermediate
images to Firebase Storage (10-min signed URLs) or Imgur (reference
image_utils.py:76-96).

This module reproduces that observable contract framework-side:
`TaskState` is a thread-safe key/value store any serving layer can poll;
`Uploader` is the artifact hook — `LocalUploader` persists to a directory
and returns file:// URLs (default), and Firebase/Imgur uploaders activate
when their SDKs + env vars (`FIREBASE_CREDENTIAL_PATH`,
`FIREBASE_STORAGE_URL`, `IMGUR_CLIENT_ID` — same names as the reference,
image_utils.py:16-22) are present.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Dict


class TaskState:
    """Thread-safe task-state dict (the Anvil task_state analog)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._state: Dict[str, Any] = {}

    def store(self, key: str, value: Any) -> None:
        with self._lock:
            self._state[key] = value

    def get(self, key: str, default=None):
        with self._lock:
            return self._state.get(key, default)

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            return dict(self._state)


_GLOBAL_STATE = TaskState()


def store_task_state(key: str, value: Any) -> None:
    """Module-level convenience mirroring the reference call sites
    (reference functional.py:177-179)."""
    _GLOBAL_STATE.store(key, value)


def get_task_state(key: str, default=None):
    return _GLOBAL_STATE.get(key, default)


class Uploader:
    """Artifact publishing hook: upload(path, minutes_ttl) -> URL."""

    def upload(self, path: str, minutes: int = 10) -> str:  # pragma: no cover
        raise NotImplementedError


class LocalUploader(Uploader):
    """Default: artifacts stay on local disk.

    URL is file:// — unless `url_base` is set (the HTTP server passes its
    own http://host:port), in which case paths under `base_dir` become
    fetchable `<url_base>/files/<relpath>` URLs served by
    runtime/server.py.  This closes the reference's progress-streaming
    contract (reference sample.py:297-303 + image_utils.py:76-96 upload a
    cloud URL every 5 steps) in the default no-Firebase/no-Imgur deploy:
    a remote client polling /task_state can GET current_result directly."""

    def __init__(self, base_dir: str = "output_images",
                 url_base: str | None = None):
        self.base_dir = base_dir
        self.url_base = url_base
        os.makedirs(base_dir, exist_ok=True)

    def upload(self, path: str, minutes: int = 10) -> str:
        abspath = os.path.abspath(path)
        if self.url_base:
            root = os.path.abspath(self.base_dir)
            if abspath.startswith(root + os.sep):
                rel = os.path.relpath(abspath, root).replace(os.sep, "/")
                return f"{self.url_base.rstrip('/')}/files/{rel}"
        return "file://" + abspath


class FirebaseUploader(Uploader):
    """Firebase Storage with signed URLs (reference image_utils.py:76-86).
    Requires firebase_admin + FIREBASE_CREDENTIAL_PATH/FIREBASE_STORAGE_URL."""

    def __init__(self):
        import datetime

        import firebase_admin
        from firebase_admin import credentials, storage

        if not firebase_admin._apps:
            cred = credentials.Certificate(
                os.environ["FIREBASE_CREDENTIAL_PATH"]
            )
            firebase_admin.initialize_app(
                cred, {"storageBucket": os.environ["FIREBASE_STORAGE_URL"]}
            )
        self._storage = storage
        self._dt = datetime

    def upload(self, path: str, minutes: int = 10) -> str:
        bucket = self._storage.bucket()
        blob = bucket.blob(os.path.basename(path))
        blob.upload_from_filename(path)
        return blob.generate_signed_url(
            expiration=self._dt.timedelta(minutes=minutes)
        )


class ImgurUploader(Uploader):
    """Imgur anonymous upload (reference image_utils.py:88-96).
    Requires pyimgur + IMGUR_CLIENT_ID."""

    def __init__(self):
        import pyimgur

        self._client = pyimgur.Imgur(os.environ["IMGUR_CLIENT_ID"])

    def upload(self, path: str, minutes: int = 10) -> str:
        return self._client.upload_image(path, title=None).link


def default_uploader(base_dir: str = "output_images") -> Uploader:
    """Firebase if configured, else Imgur, else local (the reference
    hard-requires cloud credentials at import; here cloud is opt-in)."""
    if os.environ.get("FIREBASE_CREDENTIAL_PATH") and os.environ.get(
        "FIREBASE_STORAGE_URL"
    ):
        try:
            return FirebaseUploader()
        except Exception:
            pass
    if os.environ.get("IMGUR_CLIENT_ID"):
        try:
            return ImgurUploader()
        except Exception:
            pass
    return LocalUploader(base_dir)


class StepTimer:
    """Lightweight per-step timing (the tqdm/ProgressBar analog; SURVEY.md
    §5 tracing: jax.profiler hooks belong at the serving layer)."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    @property
    def per_step(self) -> float:
        return (time.time() - self.t0) / max(self.steps, 1)
