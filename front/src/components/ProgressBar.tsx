// Progress bar with an animated highlight sweep; red variant while a
// cancellation is in flight.

interface Props {
  progress: number;
  message: string;
}

export default function ProgressBar({ progress, message }: Props) {
  const cancelling = message.toLowerCase().includes("cancel");
  return (
    <div className="progress-wrap">
      <div className={`progress-track ${cancelling ? "progress-cancel" : ""}`}>
        <div
          className="progress-fill"
          style={{ width: `${Math.min(progress, 100)}%` }}
        >
          <div className="progress-sheen" />
        </div>
      </div>
      <div className="progress-label">
        {Math.round(progress)}% — {message || "working…"}
      </div>
    </div>
  );
}
