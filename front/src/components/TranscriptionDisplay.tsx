// Transcript viewer: per-speaker coloring, stats (word count, duration,
// turns per speaker), copy-to-clipboard, TXT + PDF downloads.

import { useMemo, useState } from "react";
import { API_BASE_URL } from "../config";

interface Props {
  taskId: string;
  transcript: string;
}

interface Utterance {
  speaker: string;
  start: string;
  end: string;
  text: string;
}

const HEADER_RE = /^\[([A-Z_]+)\]\s+([\d.]+)s\s+-\s+([\d.]+)s$/;

function parse(transcript: string): Utterance[] {
  const out: Utterance[] = [];
  for (const block of transcript.split(/\n\n+/)) {
    const lines = block.trim().split("\n");
    const m = lines[0]?.match(HEADER_RE);
    if (m) {
      out.push({
        speaker: m[1],
        start: m[2],
        end: m[3],
        text: lines.slice(1).join("\n"),
      });
    } else if (block.trim()) {
      out.push({ speaker: "UNKNOWN", start: "", end: "", text: block.trim() });
    }
  }
  return out;
}

const SPEAKER_CLASS: Record<string, string> = {
  SPEAKER_A: "speaker-a",
  SPEAKER_B: "speaker-b",
};

export default function TranscriptionDisplay({ taskId, transcript }: Props) {
  const [copied, setCopied] = useState(false);
  const [expanded, setExpanded] = useState(false);
  const utterances = useMemo(() => parse(transcript), [transcript]);

  const stats = useMemo(() => {
    const words = transcript
      .split("\n")
      .filter((l) => l && !HEADER_RE.test(l))
      .join(" ")
      .split(/\s+/)
      .filter(Boolean).length;
    const last = utterances[utterances.length - 1];
    const duration = last ? parseFloat(last.end || "0") : 0;
    const turns: Record<string, number> = {};
    for (const u of utterances) turns[u.speaker] = (turns[u.speaker] ?? 0) + 1;
    return { words, duration, turns };
  }, [transcript, utterances]);

  const copy = async () => {
    await navigator.clipboard.writeText(transcript);
    setCopied(true);
    window.setTimeout(() => setCopied(false), 1500);
  };

  const shown = expanded ? utterances : utterances.slice(0, 12);

  return (
    <section className="panel">
      <h2>Transcript</h2>
      <div className="stats-row">
        <span>{stats.words} words</span>
        <span>{stats.duration.toFixed(1)} s</span>
        {Object.entries(stats.turns).map(([spk, n]) => (
          <span key={spk}>
            {spk.replace("SPEAKER_", "Speaker ")}: {n} turns
          </span>
        ))}
      </div>
      <div className="transcript">
        {shown.map((u, i) => (
          <div key={i} className={`utterance ${SPEAKER_CLASS[u.speaker] ?? ""}`}>
            <div className="utterance-head">
              <strong>{u.speaker.replace("SPEAKER_", "Speaker ")}</strong>
              {u.start && (
                <span className="timestamp">
                  {u.start}s – {u.end}s
                </span>
              )}
            </div>
            <p>{u.text}</p>
          </div>
        ))}
      </div>
      {utterances.length > 12 && (
        <button onClick={() => setExpanded(!expanded)}>
          {expanded ? "Show less" : `Show all ${utterances.length} segments`}
        </button>
      )}
      <div className="row">
        <button onClick={copy}>{copied ? "Copied!" : "Copy text"}</button>
        <a
          className="button-link"
          href={`${API_BASE_URL}/download/${taskId}/transcript.txt`}
        >
          Download TXT
        </a>
        <a className="button-link" href={`${API_BASE_URL}/download-pdf/${taskId}`}>
          Download PDF
        </a>
      </div>
    </section>
  );
}
