"""FramePack streaming demo — the reference gradio UI's interaction surface
(``MagCache4FramePack/magcache_demo_gradio.py``) re-built on the TPU
pipeline.

What carries over behaviorally:
- background worker + event stream: a worker thread runs the sectioned
  generation and pushes ``('progress', ...)`` / ``('file', path)`` /
  ``('end', None)`` events that the UI generator drains (reference
  ``AsyncStream`` + ``worker`` :406-633, ``process`` :637-662);
- interruption: an 'end' flag on the input queue stops the run at the next
  check (reference checks per denoise-callback step, :510-511; here the
  check sits at section boundaries — a jitted section is one XLA dispatch
  and is not host-interruptible by design);
- incremental preview: every finished section decodes (when a VAE is
  attached) and is re-saved so the UI file widget refreshes (:595-621);
- MagCache/TeaCache checkbox mutual exclusion (:30-52).

The gradio layer itself is optional: ``build_ui()`` raises a clear error if
gradio is not installed; everything below it (``AsyncStream``,
``DemoSession``, the toggle handlers) is plain Python and unit-tested
without gradio.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Optional

import numpy as np

__all__ = ["AsyncStream", "DemoSession", "handle_magcache_change",
           "handle_teacache_change", "build_ui", "main"]


def handle_magcache_change(magcache_value: bool, teacache_value: bool):
    """Checking MagCache unchecks TeaCache (``magcache_demo_gradio.py:30-41``).
    Returns the new (magcache, teacache) values."""
    if magcache_value and teacache_value:
        return True, False
    return magcache_value, teacache_value


def handle_teacache_change(magcache_value: bool, teacache_value: bool):
    """Checking TeaCache unchecks MagCache (``:43-52``)."""
    if magcache_value and teacache_value:
        return False, True
    return magcache_value, teacache_value


class AsyncStream:
    """Input-flag + output-event pair backing a worker/UI handoff (the
    reference's ``diffusers_helper.thread_utils.AsyncStream``)."""

    def __init__(self):
        self._in_flag: Optional[str] = None
        self._lock = threading.Lock()
        self.output_queue: "queue.Queue[tuple]" = queue.Queue()

    def push_input(self, flag: str):
        with self._lock:
            self._in_flag = flag

    def input_top(self) -> Optional[str]:
        with self._lock:
            return self._in_flag

    def push(self, event: tuple):
        self.output_queue.put(event)

    def next(self, timeout: Optional[float] = None) -> tuple:
        return self.output_queue.get(timeout=timeout)


class DemoSession:
    """One generation run: builds (or reuses) a FramePackPipeline and streams
    section events. ``events()`` is the UI-facing generator."""

    def __init__(self, pipeline=None, out_dir: str = "/tmp/framepack_demo"):
        self.pipeline = pipeline
        self.out_dir = out_dir
        self.stream: Optional[AsyncStream] = None
        self._thread: Optional[threading.Thread] = None
        self._built_kw: Optional[dict] = None   # cfg the session built from

    def _build_pipeline(self, **cfg_kw):
        from magcache_tpu.pipelines.framepack import (FramePackPipeline,
                                                      FramePackPipelineConfig)
        return FramePackPipeline(FramePackPipelineConfig(**cfg_kw))

    # -- worker ------------------------------------------------------------
    def _worker(self, prompt: str, seed: int, start_latent, stream: AsyncStream):
        pipe = self.pipeline
        os.makedirs(self.out_dir, exist_ok=True)
        job = f"job_{int(time.time() * 1000)}_{seed}"
        total = pipe.config.total_sections
        stream.push(("progress", (None, "Starting ...", 0)))
        done: list = []

        def on_section(i, sec):
            done.append(sec)
            if stream.input_top() == "end":
                raise _Interrupted()
            # incremental save: latents always; pixels when a VAE is attached
            # (the reference re-decodes + re-saves the growing mp4, :595-621)
            hist = np.concatenate(done, axis=1)
            path = os.path.join(self.out_dir, f"{job}_{hist.shape[1]}.npy")
            if pipe.vae is not None:
                import jax.numpy as jnp
                px = np.asarray(pipe.vae.decode(jnp.asarray(hist)))
                path = path.replace(".npy", "_pixels.npy")
                np.save(path, px)
            else:
                np.save(path, hist)
            pct = int(100 * len(done) / total)
            stream.push(("progress",
                         (sec, f"section {len(done)}/{total}", pct)))
            stream.push(("file", path))

        try:
            pipe.generate(prompt, seed=seed, on_section=on_section,
                          start_latent=start_latent)
        except _Interrupted:
            pass
        except Exception as e:  # surface worker failures to the UI
            stream.push(("error", repr(e)))
        stream.push(("end", None))

    # -- UI surface --------------------------------------------------------
    def start(self, prompt: str, seed: int = 31337, start_latent=None,
              **cfg_kw) -> AsyncStream:
        if self._thread is not None and self._thread.is_alive():
            # a second Start while a worker runs would orphan it (Stop could
            # no longer reach the old stream) and interleave device work
            raise RuntimeError(
                "a generation is already running; press Stop (session.end) "
                "and wait for it to finish first")
        if self.pipeline is None:
            self.pipeline = self._build_pipeline(**cfg_kw)
            self._built_kw = dict(cfg_kw)
        elif self._built_kw is not None and cfg_kw and \
                dict(cfg_kw) != self._built_kw:
            # the UI widgets changed between runs: the caching config lives
            # in the pipeline, so it must be rebuilt (an externally injected
            # pipeline — _built_kw None — is left alone)
            self.pipeline = self._build_pipeline(**cfg_kw)
            self._built_kw = dict(cfg_kw)
        self.stream = AsyncStream()
        self._thread = threading.Thread(
            target=self._worker, args=(prompt, seed, start_latent, self.stream),
            daemon=True)
        self._thread.start()
        return self.stream

    def end(self):
        """The Stop button (``end_process``, :665-666)."""
        if self.stream is not None:
            self.stream.push_input("end")

    def events(self, timeout: float = 600.0):
        """Drain worker events until 'end' — the ``process()`` generator."""
        assert self.stream is not None, "start() first"
        while True:
            flag, data = self.stream.next(timeout=timeout)
            yield flag, data
            if flag == "end":
                return

    def join(self, timeout: float = 600.0):
        if self._thread is not None:
            self._thread.join(timeout=timeout)


class _Interrupted(Exception):
    pass


def build_ui(session: Optional[DemoSession] = None, **cfg_kw):
    """gradio Blocks wiring start/stop/preview around a DemoSession.
    Requires gradio (not bundled in this image — the logic above is what the
    tests pin; this function is the thin presentation shell)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed; `pip install gradio` to serve the demo "
            "UI. The generation worker (DemoSession) runs without it.") from e

    session = session or DemoSession()

    def process(prompt, seed, use_magcache, use_teacache, thresh, K, ret):
        session.start(prompt, seed=int(seed), use_magcache=use_magcache,
                      use_teacache=use_teacache,
                      magcache_thresh=thresh or None,
                      magcache_K=int(K) if K else None,
                      retention_ratio=ret or None, **cfg_kw)
        for flag, data in session.events():
            if flag == "file":
                yield data, gr.update(interactive=False), gr.update(
                    interactive=True)
            elif flag == "progress":
                _, desc, pct = data
                yield gr.update(), gr.update(), gr.update(value=f"{desc} ({pct}%)")
            elif flag == "error":
                yield gr.update(), gr.update(), gr.update(
                    value=f"**Generation failed:** {data}")
        yield gr.update(), gr.update(interactive=True), gr.update(
            interactive=False)

    with gr.Blocks(title="FramePack (magcache-tpu)") as block:
        gr.Markdown("# FramePack — sectioned streaming generation")
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt")
                seed = gr.Number(label="Seed", value=31337, precision=0)
                use_magcache = gr.Checkbox(label="Use MagCache", value=True)
                use_teacache = gr.Checkbox(label="Use TeaCache", value=False)
                thresh = gr.Slider(0.0, 1.0, value=0.1,
                                   label="magcache_thresh")
                K = gr.Slider(0, 10, value=3, step=1, label="magcache_K")
                ret = gr.Slider(0.0, 1.0, value=0.2, label="retention_ratio")
                start_btn = gr.Button("Start Generation")
                end_btn = gr.Button("End Generation", interactive=False)
            with gr.Column():
                out_file = gr.File(label="Output (growing)")
                status = gr.Markdown("")
        use_magcache.change(handle_magcache_change,
                            [use_magcache, use_teacache],
                            [use_magcache, use_teacache])
        use_teacache.change(handle_teacache_change,
                            [use_magcache, use_teacache],
                            [use_magcache, use_teacache])
        start_btn.click(process,
                        [prompt, seed, use_magcache, use_teacache, thresh, K,
                         ret],
                        [out_file, start_btn, end_btn])
        end_btn.click(lambda: session.end(), [], [])
    return block


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser("framepack demo server")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    kw = dict(tiny=True, pyramid=False, height=64, width=64,
              latent_window_size=3, total_sections=3) if args.tiny else {}
    build_ui(**kw).queue().launch(server_port=args.port)


if __name__ == "__main__":
    main()
