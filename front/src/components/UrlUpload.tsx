// URL ingest: client-side validation (Google Drive / direct audio links),
// form POST. Server-side download progress isn't observable, so the bar is
// indeterminate while the request is in flight.

import { useState } from "react";
import { API_BASE_URL } from "../config";

const VALID_EXT = [".mp3", ".wav", ".ogg", ".mp4", ".flac", ".m4a", ".aac"];

function looksValid(url: string): boolean {
  let parsed: URL;
  try {
    parsed = new URL(url);
  } catch {
    return false;
  }
  if (!/^https?:$/.test(parsed.protocol)) return false;
  if (parsed.hostname.includes("drive.google.com")) {
    return /\/file\/d\/[^/]+/.test(parsed.pathname) || parsed.searchParams.has("id");
  }
  return VALID_EXT.some((e) => parsed.pathname.toLowerCase().endsWith(e));
}

interface Props {
  onUploaded: (taskId: string, previewUrl: string) => void;
  onBack: () => void;
}

export default function UrlUpload({ onUploaded, onBack }: Props) {
  const [url, setUrl] = useState("");
  const [busy, setBusy] = useState(false);
  const [error, setError] = useState<string | null>(null);

  const submit = async () => {
    if (!looksValid(url)) {
      setError("Enter a direct audio link (.mp3/.wav/…) or a Google Drive share link.");
      return;
    }
    setError(null);
    setBusy(true);
    try {
      const form = new URLSearchParams({ url });
      const resp = await fetch(`${API_BASE_URL}/upload-url`, {
        method: "POST",
        headers: { "Content-Type": "application/x-www-form-urlencoded" },
        body: form.toString(),
      });
      const body = await resp.json();
      if (!resp.ok) throw new Error(body.detail ?? `status ${resp.status}`);
      onUploaded(body.task_id, body.preview_url);
    } catch (e) {
      setError(`${e}`);
    } finally {
      setBusy(false);
    }
  };

  return (
    <section className="panel">
      <h2>Transcribe from a URL</h2>
      <div className="row">
        <input
          className="url-input"
          type="url"
          placeholder="https://example.com/audio.mp3 or a Google Drive link"
          value={url}
          onChange={(e) => setUrl(e.target.value)}
          onKeyDown={(e) => e.key === "Enter" && submit()}
          disabled={busy}
        />
        <button className="primary" onClick={submit} disabled={busy}>
          {busy ? "Fetching…" : "Fetch"}
        </button>
      </div>
      {busy && <div className="indeterminate-bar" />}
      {error && <p className="error-text">{error}</p>}
      <div className="row">
        <button onClick={onBack} disabled={busy}>
          Back
        </button>
      </div>
    </section>
  );
}
