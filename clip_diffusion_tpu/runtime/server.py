"""HTTP serving layer — the Anvil-uplink replacement (reference L5).

The reference exposes its pipelines through Anvil RPC from a Colab process
(`connect_to_anvil` + `wait_forever`, reference utils/colab_helper.py:67-78;
callables in utils/anvil_utils.py:36-95 and notebook cells 15-16), with
progress polled from background-task state.

Here the same surface is a dependency-free stdlib HTTP JSON API:

    POST /guided_sample     kwargs of sample.guided_diffusion_sample; an
                            optional "model_type" picks a registered
                            finetuned UNet (reference 通用/景觀/建築)
    POST /latent_sample     kwargs of sample.latent_diffusion_sample
    GET  /model_types       registered model-type names
    GET  /task_state        the progress key/value contract
    GET  /seed              -> {"seed": "<uint32 as string>"}
    POST /change_settings   Config knobs -> applied to subsequent requests
    GET  /random_prompt
    GET  /chosen_image?choice=N   PNG bytes (SR'd latent output)
    GET  /files/<relpath>   artifact bytes from the output dir (progress
                            PNGs, final images, GIFs).  This is what makes
                            `current_result` REMOTELY fetchable without
                            Firebase/Imgur credentials: jobs launched by
                            this server get a LocalUploader whose URLs
                            point here (reference contract: a cloud URL
                            every 5 steps, sample.py:297-303)
    POST /analyze_image     {"image_b64": ...} -> top-3 styles/media

Requests run on a background worker thread (one at a time — the TPU is a
serial resource, mirroring Anvil's serialized background tasks; SURVEY.md
§5 race detection: nothing shared but TaskState, which is locked).
"""

from __future__ import annotations

import base64
import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

from clip_diffusion_tpu.config import Config
from clip_diffusion_tpu.parallel import serving
from clip_diffusion_tpu.utils.progress import _GLOBAL_STATE


class _Worker:
    """Single background task slot (Anvil launch_background_task analog)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self.result = None
        self.error = None

    def launch(self, fn, kwargs) -> bool:
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                return False
            self.result = None
            self.error = None
            # reset the shared progress keys BEFORE the thread spawns: the
            # job resets them too, but only after its own setup — a client
            # polling right after the POST must never see the PREVIOUS
            # job's current_result/current_step (on a loaded 1-core host
            # that stale window spans seconds; caught by
            # tests/test_server.py running after other server tests)
            from clip_diffusion_tpu.utils.progress import store_task_state

            store_task_state("current_result", None)
            store_task_state("current_step", None)

            def run():
                try:
                    self.result = fn(**kwargs)
                except Exception:  # noqa: BLE001 — reported via /task_state
                    self.error = traceback.format_exc()

            self._thread = threading.Thread(target=run, daemon=True)
            self._thread.start()
            return True

    @property
    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()


class ClipDiffusionServer:
    def __init__(self, host="127.0.0.1", port=8080, config: Optional[Config] = None,
                 guided_fn=None, latent_fn=None, analyzer=None, models=None,
                 registry=None, output_dir: str = "output_images"):
        import os

        from clip_diffusion_tpu import sample as sample_mod

        self.config = config or Config()
        # artifacts root served by GET /files/<relpath>; jobs launched here
        # write into it (sample.py's OUTPUT_PATH default) and their
        # LocalUploader turns paths into URLs under this endpoint.  With
        # host 0.0.0.0 the advertised URL keeps 0.0.0.0 — remote clients
        # substitute the address they dialed (same limitation as any
        # self-advertised bind-all server).
        self.files_root = os.path.abspath(output_dir)
        self.models = models
        if guided_fn is None and models is not None:
            import functools

            guided_fn = functools.partial(
                sample_mod.guided_diffusion_sample, models=models
            )
        self.guided_fn = guided_fn or sample_mod.guided_diffusion_sample
        self.latent_fn = latent_fn or sample_mod.latent_diffusion_sample
        if analyzer is None and models is not None:
            from clip_diffusion_tpu.parallel.serving import make_analyzer

            analyzer = make_analyzer(models)
        self.analyzer = analyzer
        if registry is None:
            # per-request model selection (reference notebook cells 14-16:
            # model_type 通用/景觀/建築 -> finetuned checkpoint); auto-
            # discovers guided_unet_custom_<name> converted checkpoints
            from clip_diffusion_tpu.runtime.registry import UNetRegistry

            registry = UNetRegistry().discover()
        self.registry = registry
        self.worker = _Worker()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/seed":
                    self._json(200, {"seed": serving.get_seed()})
                elif url.path == "/task_state":
                    state = _GLOBAL_STATE.snapshot()
                    state["busy"] = server.worker.busy
                    state["error"] = server.worker.error
                    state["result"] = server.worker.result
                    self._json(200, state)
                elif url.path == "/model_types":
                    self._json(200, {"model_types": server.registry.names()})
                elif url.path == "/random_prompt":
                    ptype = parse_qs(url.query).get("type", ["景觀"])[0]
                    self._json(
                        200, {"prompt": serving.get_random_prompt(ptype)}
                    )
                elif url.path == "/chosen_image":
                    choice = int(parse_qs(url.query).get("choice", ["0"])[0])
                    try:
                        data = serving.get_chosen_image(choice)
                    except FileNotFoundError:
                        self._json(404, {"error": "no such image"})
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif url.path.startswith("/files/"):
                    self._serve_file(url.path[len("/files/"):])
                else:
                    self._json(404, {"error": "unknown endpoint"})

            _MIME = {".png": "image/png", ".gif": "image/gif",
                     ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
                     ".json": "application/json"}

            def _serve_file(self, relpath):
                """GET /files/<relpath>: artifact bytes rooted at
                server.files_root, path-traversal-safe (realpath must stay
                under the root — rejects ../ escapes and symlinks out)."""
                import os

                from urllib.parse import unquote

                root = os.path.realpath(server.files_root)
                full = os.path.realpath(os.path.join(root, unquote(relpath)))
                if full != root and not full.startswith(root + os.sep):
                    self._json(403, {"error": "path outside artifact root"})
                    return
                if not os.path.isfile(full):
                    self._json(404, {"error": "no such file"})
                    return
                with open(full, "rb") as f:
                    data = f.read()
                ext = os.path.splitext(full)[1].lower()
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    self._MIME.get(ext, "application/octet-stream"),
                )
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _body(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def do_POST(self):
                url = urlparse(self.path)
                if url.path == "/guided_sample":
                    kwargs = self._body()
                    # model_type -> finetuned-UNet params via the registry
                    # (the reference's per-request checkpoint selection,
                    # notebook cells 14-16 -> sample.py:64,97-99)
                    model_type = kwargs.pop("model_type", None)
                    if model_type is not None:
                        from clip_diffusion_tpu.runtime.registry import (
                            UnknownModelType,
                        )

                        try:
                            custom = server.registry.load(model_type)
                        except UnknownModelType as e:
                            # only the dedicated unknown-name error is a
                            # client 400 — a bare KeyError from inside a
                            # registered checkpoint's tree is a broken
                            # SERVER asset and falls through to the 500
                            self._json(400, {"error": str(e)})
                            return
                        except Exception as e:  # noqa: BLE001
                            # corrupt / architecture-mismatched checkpoint
                            # (RuntimeError from the shared validated-load
                            # gate, orbax IO errors, stray KeyErrors from a
                            # broken tree): answer with JSON instead of
                            # killing the connection mid-handler
                            self._json(
                                500,
                                {"error": f"model_type {model_type!r} "
                                          f"failed to load: {e}"},
                            )
                            return
                        if custom is not None:
                            kwargs["custom_model_params"] = custom
                    ok = server.worker.launch(
                        server.guided_fn,
                        {**server._artifact_kwargs(), **kwargs,
                         "config": server.config},
                    )
                    self._json(200 if ok else 409,
                               {"started": ok} if ok else {"error": "busy"})
                elif url.path == "/latent_sample":
                    kwargs = self._body()
                    ok = server.worker.launch(
                        server.latent_fn,
                        {**server._artifact_kwargs(), **kwargs},
                    )
                    self._json(200 if ok else 409,
                               {"started": ok} if ok else {"error": "busy"})
                elif url.path == "/change_settings":
                    server.config = serving.change_settings(
                        server.config, **self._body()
                    )
                    self._json(200, {"ok": True})
                elif url.path == "/analyze_image":
                    if server.analyzer is None:
                        self._json(503, {"error": "analyzer not configured"})
                        return
                    import io

                    import numpy as np
                    from PIL import Image

                    payload = self._body()
                    raw = base64.b64decode(payload["image_b64"])
                    img = np.asarray(
                        Image.open(io.BytesIO(raw)).convert("RGB"),
                        dtype=np.float32,
                    ) / 255.0
                    self._json(200, server.analyzer(img))
                else:
                    self._json(404, {"error": "unknown endpoint"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        # built after bind so ephemeral port=0 resolves; jobs launched by
        # this server publish artifacts as /files/ URLs on this address
        from clip_diffusion_tpu.utils.progress import LocalUploader

        self.uploader = LocalUploader(
            self.files_root, url_base=f"http://{host}:{self.port}"
        )

    def _artifact_kwargs(self) -> dict:
        """Defaults merged UNDER client kwargs for launched jobs: write
        artifacts into the served root and publish them as /files/ URLs."""
        return {"uploader": self.uploader, "output_dir": self.files_root}

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self):
        """The reference's anvil.server.wait_forever analog."""
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
