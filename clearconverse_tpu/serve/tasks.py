"""Task orchestration: the reference's marker-file protocol with an
in-process executor.

Protocol parity (back/api.py:1689-1754): per task directory
``{output_dir}/{task_id}/`` with ``progress.json`` + markers
``in_progress.txt`` / ``completed.txt`` / ``error.txt`` / ``cancelled.txt``
written with the same contents and ordering — the WS poller and status
endpoint read EXACTLY what the reference's do.

Execution difference (the designed one, SURVEY.md §5.8): instead of a
``multiprocessing.Process`` per task that cold-loads every model
(back/api.py:1718), tasks run on a worker thread against ONE shared
TranscriptionEngine whose models load once; the TPU stays owned by this
process. Cancellation is cooperative: a per-task event checked at every
progress boundary (device programs are short, so latency is bounded) —
replacing the reference's psutil process-tree kill (back/api.py:2029-2042).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import threading
import time
from datetime import datetime
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)


class TaskCancelled(Exception):
    pass


class TaskRunner:
    def __init__(self, output_dir: str, engine_factory: Callable):
        self.output_dir = output_dir
        self._engine_factory = engine_factory
        self._engine = None
        self._engine_lock = threading.Lock()   # one TPU program at a time
        # In-memory stores, same roles as back/api.py:94-578.
        self.active_tasks: Dict[str, Dict] = {}
        self.progress_store: Dict[str, Dict] = {}
        self.result_store: Dict[str, Dict] = {}
        self.uploaded_files: Dict[str, str] = {}
        self.original_filenames: Dict[str, str] = {}

    # ------------------------------------------------------------- engine
    def engine(self):
        if self._engine is None:
            self._engine = self._engine_factory()
        return self._engine

    def update_progress(self, task_id: str, percent: int, message: str) -> None:
        self.progress_store[task_id] = {"progress": percent, "message": message}
        logger.info("Task %s: %d%% - %s", task_id, percent, message)

    # -------------------------------------------------------------- start
    def start(self, task_id: str, file_path: str) -> None:
        cancel = threading.Event()
        thread = threading.Thread(target=self._run_task,
                                  args=(task_id, file_path, cancel),
                                  daemon=True)
        self.active_tasks[task_id] = {
            "thread": thread, "cancel": cancel,
            "start_time": time.time(), "file_path": file_path,
        }
        thread.start()

    def is_alive(self, task_id: str) -> bool:
        info = self.active_tasks.get(task_id)
        return bool(info and info["thread"].is_alive())

    def _run_task(self, task_id: str, file_path: str, cancel: threading.Event) -> None:
        task_dir = os.path.join(self.output_dir, task_id)
        os.makedirs(task_dir, exist_ok=True)
        completed_marker = os.path.join(task_dir, "completed.txt")
        if os.path.exists(completed_marker):
            logger.info("Task %s already completed, skipping", task_id)
            return

        def progress_callback(percent, message):
            if cancel.is_set():
                raise TaskCancelled()
            progress_file = os.path.join(task_dir, "progress.json")
            with open(progress_file, "w") as fh:
                json.dump({"progress": percent, "message": message}, fh)
            logger.info("Task %s: %s%% - %s", task_id, percent, message)

        in_progress = os.path.join(task_dir, "in_progress.txt")
        try:
            progress_callback(5, "Starting model initialization...")
            with self._engine_lock:
                if cancel.is_set():
                    raise TaskCancelled()
                _, transcript, _ = self.engine().run(
                    file_path, output_dir=task_dir, debug_mode=False,
                    progress_callback=progress_callback)
            if transcript is None:
                raise RuntimeError("Processing produced no transcript")
            if os.path.exists(in_progress):
                os.remove(in_progress)
            progress_callback(100, "Transcription complete")
            with open(completed_marker, "w") as fh:
                fh.write(f"Transcription completed at {datetime.now().isoformat()}")
            # The reference's forked worker could never write result_store
            # (separate address space — SURVEY.md §2.2 quirk); in-process we
            # can make /task/{id}/result real.
            self.result_store[task_id] = {
                "status": "completed",
                "download_url": f"/download/{task_id}/transcript.txt",
            }
        except TaskCancelled:
            logger.info("Task %s cancelled", task_id)
        except Exception as exc:  # noqa: BLE001 — parity: error marker
            logger.error("Error in transcription process: %s", exc)
            if not cancel.is_set():
                with open(os.path.join(task_dir, "error.txt"), "w") as fh:
                    fh.write(f"Error: {exc}")
                if os.path.exists(in_progress):
                    os.remove(in_progress)
                try:
                    progress_callback(100, f"Error: {exc}")
                except TaskCancelled:
                    pass

    # -------------------------------------------------------------- cancel
    def cancel(self, task_id: str) -> None:
        """Reference semantics (back/api.py:2073-2139): stop work, delete the
        output dir, write cancelled.txt, KEEP the upload."""
        info = self.active_tasks.pop(task_id, None)
        if info:
            info["cancel"].set()
        task_dir = os.path.join(self.output_dir, task_id)
        if os.path.exists(task_dir):
            try:
                shutil.rmtree(task_dir)
            except OSError as exc:
                logger.error("Failed to remove output dir: %s", exc)
        os.makedirs(task_dir, exist_ok=True)
        with open(os.path.join(task_dir, "cancelled.txt"), "w") as fh:
            fh.write("Transcription was cancelled")

    def stop_if_running(self, task_id: str) -> None:
        info = self.active_tasks.pop(task_id, None)
        if info:
            info["cancel"].set()
