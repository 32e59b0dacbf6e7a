// Drag-drop / picker upload with real XHR progress events and abort.
// Validation contract mirrors the reference component: primary .wav/.mp3
// plus the secondary ext/MIME tier (.mp4/.webm/.ogg/.flac/.m4a/.aac — may
// require conversion), size cap before sending. The rules live in
// ../validate.ts as pure, unit-testable functions.

import { useRef, useState } from "react";
import { API_BASE_URL } from "../config";
import { ACCEPT_ATTR, validateFile } from "../validate";

interface Props {
  onUploaded: (taskId: string, previewUrl: string) => void;
  onBack: () => void;
}

export default function FileUpload({ onUploaded, onBack }: Props) {
  const [dragOver, setDragOver] = useState(false);
  const [uploading, setUploading] = useState(false);
  const [percent, setPercent] = useState(0);
  const [error, setError] = useState<string | null>(null);
  const xhrRef = useRef<XMLHttpRequest | null>(null);
  const inputRef = useRef<HTMLInputElement | null>(null);

  const upload = (file: File) => {
    const problem = validateFile(file);
    if (problem) {
      setError(problem);
      return;
    }
    setError(null);
    setUploading(true);
    setPercent(0);

    const form = new FormData();
    form.append("file", file);
    const xhr = new XMLHttpRequest();
    xhrRef.current = xhr;
    xhr.open("POST", `${API_BASE_URL}/upload-file`);
    xhr.upload.onprogress = (ev) => {
      if (ev.lengthComputable) setPercent((ev.loaded / ev.total) * 100);
    };
    xhr.onload = () => {
      setUploading(false);
      if (xhr.status === 200) {
        const body = JSON.parse(xhr.responseText);
        onUploaded(body.task_id, body.preview_url);
      } else {
        let detail = `Upload failed (${xhr.status})`;
        try {
          detail = JSON.parse(xhr.responseText).detail ?? detail;
        } catch {
          /* keep default */
        }
        setError(detail);
      }
    };
    xhr.onerror = () => {
      setUploading(false);
      setError("Network error during upload.");
    };
    xhr.send(form);
  };

  const abort = () => {
    xhrRef.current?.abort();
    setUploading(false);
    setPercent(0);
  };

  return (
    <section className="panel">
      <h2>Upload an audio file</h2>
      <div
        className={`dropzone ${dragOver ? "dropzone-over" : ""}`}
        onDragOver={(e) => {
          e.preventDefault();
          setDragOver(true);
        }}
        onDragLeave={() => setDragOver(false)}
        onDrop={(e) => {
          e.preventDefault();
          setDragOver(false);
          const file = e.dataTransfer.files?.[0];
          if (file) upload(file);
        }}
        onClick={() => inputRef.current?.click()}
      >
        {uploading
          ? `Uploading… ${percent.toFixed(0)}%`
          : "Drop a .wav or .mp3 here (or .mp4/.webm/.ogg/.flac/.m4a/.aac), or click to choose"}
        <input
          ref={inputRef}
          type="file"
          accept={ACCEPT_ATTR}
          hidden
          onChange={(e) => {
            const file = e.target.files?.[0];
            if (file) upload(file);
          }}
        />
      </div>
      {uploading && (
        <div className="upload-progress">
          <div className="upload-bar" style={{ width: `${percent}%` }} />
        </div>
      )}
      {error && <p className="error-text">{error}</p>}
      <div className="row">
        {uploading && <button onClick={abort}>Abort</button>}
        <button onClick={onBack}>Back</button>
      </div>
    </section>
  );
}
