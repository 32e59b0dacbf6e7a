// Floating reset / clear actions with confirm dialogs (the reference's
// ResetButton + ClearButton + FloatingActionButton trio collapsed into one
// component: reset keeps the upload, clear removes everything).

import { useState } from "react";

interface Props {
  onReset: (clearUpload: boolean) => void;
}

export default function FloatingControls({ onReset }: Props) {
  const [confirm, setConfirm] = useState<null | "reset" | "clear">(null);

  return (
    <div className="floating-controls">
      {confirm && (
        <div className="confirm-box">
          <p>
            {confirm === "clear"
              ? "Remove the upload and all results?"
              : "Start over? The upload is kept."}
          </p>
          <div className="row">
            <button
              className="danger"
              onClick={() => {
                onReset(confirm === "clear");
                setConfirm(null);
              }}
            >
              Yes
            </button>
            <button onClick={() => setConfirm(null)}>No</button>
          </div>
        </div>
      )}
      <button className="fab" title="Start over" onClick={() => setConfirm("reset")}>
        ↺
      </button>
      <button className="fab fab-danger" title="Clear everything" onClick={() => setConfirm("clear")}>
        ✕
      </button>
    </div>
  );
}
