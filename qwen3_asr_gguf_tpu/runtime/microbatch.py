"""Server-side micro-batching.

Concurrent short transcription requests coalesce into one vmapped decode
(the reference serializes all requests on one engine,
serve_openai_gguf.py; the upstream stack gets concurrency from vLLM —
BASELINE.md's 128-stream rows). Requests arriving within `window_s` of
each other batch up to `max_batch` wide; prompts (context/language) may
differ per row since the batched generator takes per-row token ids —
only the sampling mode (temperature) keys the batch.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..schema import TranscribeResult


@dataclass
class _Pending:
    audio: np.ndarray
    context: str
    language: Optional[str]
    temperature: float
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[TranscribeResult] = None
    error: Optional[Exception] = None


class MicroBatcher:
    def __init__(self, engine, *, window_s: float = 0.05, max_batch: int = 8):
        from .batched import BatchedEngine

        self.engine = engine
        self.batched = BatchedEngine(engine)
        self.window_s = window_s
        self.max_batch = max_batch
        self.chunk_samples = int(engine.config.chunk_size * 16_000)
        self._queue: List[_Pending] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self.n_batches = 0
        self.n_batched_requests = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop = True
        self._wake.set()

    def eligible(self, audio: np.ndarray) -> bool:
        return len(audio) <= self.chunk_samples

    def submit(
        self,
        audio: np.ndarray,
        *,
        context: str = "",
        language: Optional[str] = None,
        temperature: float = 0.0,
        timeout: float = 600.0,
    ) -> TranscribeResult:
        item = _Pending(audio=audio, context=context, language=language,
                        temperature=temperature)
        with self._lock:
            self._queue.append(item)
        self._wake.set()
        if not item.done.wait(timeout):
            raise TimeoutError("transcription timed out in batch queue")
        if item.error is not None:
            raise item.error
        assert item.result is not None
        return item.result

    # -- worker --------------------------------------------------------------

    def _take_batch(self) -> List[_Pending]:
        with self._lock:
            if not self._queue:
                return []
            key = self._queue[0].temperature
            batch = [p for p in self._queue if p.temperature == key][: self.max_batch]
            for p in batch:
                self._queue.remove(p)
            if not self._queue:
                self._wake.clear()
        return batch

    def _loop(self) -> None:
        while not self._stop:
            self._wake.wait(timeout=0.5)
            if self._stop:
                return
            if not self._queue:
                # a submit() racing with _take_batch can leave _wake set with
                # an empty queue; clear it under the lock (re-checking the
                # queue) so this loop blocks instead of busy-spinning
                with self._lock:
                    if not self._queue:
                        self._wake.clear()
                continue
            time.sleep(self.window_s)  # let the batch fill
            batch = self._take_batch()
            if not batch:
                continue
            try:
                if len(batch) == 1:
                    p = batch[0]
                    p.result = self.engine.asr(
                        p.audio, context=p.context, language=p.language,
                        chunk_size_sec=self.engine.config.chunk_size,
                        memory_chunks=self.engine.config.memory_num,
                        temperature=p.temperature,
                    )
                else:
                    results = self._run_batch(batch)
                    for p, r in zip(batch, results):
                        p.result = r
                    self.n_batches += 1
                    self.n_batched_requests += len(batch)
            except Exception as e:  # pragma: no cover - surfaced to callers
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    p.done.set()

    def _run_batch(self, batch: List[_Pending]) -> List[TranscribeResult]:
        eng = self.engine
        gen = self.batched.gen
        chunk = self.chunk_samples
        ids_list, mask_list, embds = [], [], []
        for p in batch:
            a = p.audio
            n_valid = eng.encoder.valid_tokens(len(a))  # real frames only
            if len(a) < chunk:
                a = np.pad(a, (0, chunk - len(a)))
            fut = eng.encoder.encode_async(a)
            embds.append(fut[: eng.encoder.valid_tokens(chunk)])
            ids, mask = eng._build_prompt_ids(n_valid, "", p.context, p.language)
            ids_list.append(ids)
            mask_list.append(mask)
        # pad to the fixed batch width so every call reuses ONE compiled
        # program (each new width otherwise costs a multi-minute compile)
        n_real = len(batch)
        while len(ids_list) < self.max_batch:
            ids_list.append(ids_list[0])
            mask_list.append(mask_list[0])
            embds.append(embds[0])
        rows = gen.generate(
            ids_list, mask_list, embds,
            temperature=batch[0].temperature,
            max_new_tokens=eng.config.max_new_tokens,
        )
        rows = rows[:n_real]
        return [
            TranscribeResult(
                text=eng.model.decode(toks),
                performance={"batched": True, "n_generate": len(toks)},
            )
            for toks in rows
        ]
