// Application state machine: menu → upload (file|url) → preview →
// processing → transcript. Same backend contract as the reference SPA
// (SURVEY.md §2.3): REST + WebSocket progress + sendBeacon cleanup on
// unload + polling fallback when the socket dies.

import { useCallback, useEffect, useRef, useState } from "react";
import { API_BASE_URL, STATUS_POLL_INTERVAL_MS } from "./config";
import FileUpload from "./components/FileUpload";
import UrlUpload from "./components/UrlUpload";
import MainMenu from "./components/MainMenu";
import AudioPlayer from "./components/AudioPlayer";
import ProgressBar from "./components/ProgressBar";
import ProgressSocket from "./components/ProgressSocket";
import TranscriptionDisplay from "./components/TranscriptionDisplay";
import FloatingControls from "./components/FloatingControls";

export type Stage =
  | "menu"
  | "upload-file"
  | "upload-url"
  | "preview"
  | "processing"
  | "transcript";

export default function App() {
  const [stage, setStage] = useState<Stage>("menu");
  const [taskId, setTaskId] = useState<string | null>(null);
  const [previewUrl, setPreviewUrl] = useState<string | null>(null);
  const [progress, setProgress] = useState(0);
  const [progressMessage, setProgressMessage] = useState("");
  const [transcript, setTranscript] = useState<string | null>(null);
  const [error, setError] = useState<string | null>(null);
  const [wsFailed, setWsFailed] = useState(false);
  const pollTimer = useRef<number | null>(null);

  const [modelStatus, setModelStatus] = useState<string | null>(null);

  // Model-loading poll while processing (the reference polls this endpoint
  // and 404s; here it reports real state).
  useEffect(() => {
    if (stage !== "processing") {
      setModelStatus(null);
      return;
    }
    const timer = window.setInterval(async () => {
      try {
        const resp = await fetch(`${API_BASE_URL}/model-loading-status`);
        const body = await resp.json();
        setModelStatus(body.progress < 100 ? body.message : null);
      } catch {
        /* endpoint optional */
      }
    }, STATUS_POLL_INTERVAL_MS);
    return () => window.clearInterval(timer);
  }, [stage]);

  // sendBeacon cleanup on page unload (preserves uploads server-side).
  useEffect(() => {
    const onUnload = () => {
      if (taskId) {
        navigator.sendBeacon(`${API_BASE_URL}/cleanup/${taskId}`);
      }
    };
    window.addEventListener("beforeunload", onUnload);
    return () => window.removeEventListener("beforeunload", onUnload);
  }, [taskId]);

  const fetchTranscription = useCallback(async (id: string) => {
    try {
      const resp = await fetch(`${API_BASE_URL}/transcription/${id}`);
      if (resp.status === 202) {
        setError("Transcription was cancelled.");
        setStage("preview");
        return;
      }
      if (!resp.ok) throw new Error(`status ${resp.status}`);
      const body = await resp.json();
      setTranscript(body.transcription);
      setStage("transcript");
    } catch (e) {
      setError(`Could not fetch transcription: ${e}`);
    }
  }, []);

  // Fetch the transcript once progress reaches 100%.
  useEffect(() => {
    if (stage === "processing" && progress >= 100 && taskId &&
        !progressMessage.toLowerCase().includes("cancel") &&
        !progressMessage.toLowerCase().includes("error")) {
      fetchTranscription(taskId);
    }
    if (progress >= 100 && progressMessage.toLowerCase().includes("error")) {
      setError(progressMessage);
      setStage("preview");
    }
  }, [progress, progressMessage, stage, taskId, fetchTranscription]);

  // Polling fallback when the WebSocket gives up.
  useEffect(() => {
    if (stage !== "processing" || !wsFailed || !taskId) return;
    pollTimer.current = window.setInterval(async () => {
      try {
        const resp = await fetch(`${API_BASE_URL}/task/${taskId}/status`);
        const body = await resp.json();
        if (body.status === "completed") {
          setProgress(100);
          setProgressMessage("Transcription complete");
        } else if (body.status === "error" || body.status === "cancelled") {
          setProgress(100);
          setProgressMessage(body.message ?? body.status);
        } else if (typeof body.progress === "number") {
          setProgress(body.progress);
          setProgressMessage(body.message ?? "");
        }
      } catch {
        /* keep polling */
      }
    }, STATUS_POLL_INTERVAL_MS);
    return () => {
      if (pollTimer.current) window.clearInterval(pollTimer.current);
    };
  }, [stage, wsFailed, taskId]);

  const onUploaded = (id: string, preview: string) => {
    setTaskId(id);
    setPreviewUrl(`${API_BASE_URL}${preview}`);
    setError(null);
    setStage("preview");
  };

  const startTranscription = async () => {
    if (!taskId) return;
    setError(null);
    setProgress(0);
    setProgressMessage("Starting…");
    setWsFailed(false);
    try {
      const resp = await fetch(`${API_BASE_URL}/transcribe/${taskId}`, {
        method: "POST",
      });
      if (!resp.ok) {
        const body = await resp.json().catch(() => ({}));
        throw new Error(body.detail ?? `status ${resp.status}`);
      }
      const body = await resp.json();
      if (body.status === "already_completed") {
        await fetchTranscription(taskId);
        return;
      }
      setStage("processing");
    } catch (e) {
      setError(`Could not start transcription: ${e}`);
    }
  };

  const cancelTranscription = async () => {
    if (!taskId) return;
    await fetch(`${API_BASE_URL}/cancel/${taskId}`, { method: "POST" }).catch(
      () => undefined,
    );
    setStage("preview");
  };

  const reset = async (clearUpload: boolean) => {
    if (taskId) {
      await fetch(
        `${API_BASE_URL}/cleanup/${taskId}?preserve_uploads=${!clearUpload}`,
        { method: "DELETE" },
      ).catch(() => undefined);
    }
    setTaskId(null);
    setPreviewUrl(null);
    setTranscript(null);
    setProgress(0);
    setProgressMessage("");
    setError(null);
    setStage("menu");
  };

  return (
    <div className="app">
      <header className="header">
        <h1>
          <span className="brand-a">Clear</span>
          <span className="brand-b">Converse</span>
        </h1>
        <p className="tagline">Speaker-diarized transcription for overlapping speech — TPU edition</p>
      </header>

      {error && <div className="error-banner">{error}</div>}

      {stage === "menu" && (
        <MainMenu
          onChooseFile={() => setStage("upload-file")}
          onChooseUrl={() => setStage("upload-url")}
        />
      )}
      {stage === "upload-file" && (
        <FileUpload onUploaded={onUploaded} onBack={() => setStage("menu")} />
      )}
      {stage === "upload-url" && (
        <UrlUpload onUploaded={onUploaded} onBack={() => setStage("menu")} />
      )}
      {stage === "preview" && previewUrl && (
        <section className="panel">
          <h2>Preview</h2>
          <AudioPlayer src={previewUrl} />
          <div className="row">
            <button className="primary" onClick={startTranscription}>
              Transcribe
            </button>
          </div>
        </section>
      )}
      {stage === "processing" && taskId && (
        <section className="panel">
          <h2>Processing…</h2>
          <ProgressSocket
            taskId={taskId}
            onProgress={(p, m) => {
              setProgress(p);
              setProgressMessage(m);
            }}
            onSocketFailed={() => setWsFailed(true)}
          />
          <ProgressBar progress={progress} message={progressMessage} />
          {modelStatus && <p className="tagline">{modelStatus}</p>}
          <div className="row">
            <button className="danger" onClick={cancelTranscription}>
              Cancel
            </button>
          </div>
        </section>
      )}
      {stage === "transcript" && transcript && taskId && (
        <TranscriptionDisplay taskId={taskId} transcript={transcript} />
      )}

      {stage !== "menu" && <FloatingControls onReset={reset} />}
    </div>
  );
}
