// Renderless WebSocket progress subscriber with exponential-backoff
// reconnect (2^n s capped at 10 s, bounded attempts — same policy as the
// reference's WebSocketProgressHandler). Signals permanent failure so the
// app can fall back to HTTP polling.

import { useEffect, useRef } from "react";
import { MAX_WS_RECONNECT_ATTEMPTS, WS_BASE_URL } from "../config";

interface Props {
  taskId: string;
  onProgress: (progress: number, message: string) => void;
  onSocketFailed: () => void;
}

export default function ProgressSocket({ taskId, onProgress, onSocketFailed }: Props) {
  const attempts = useRef(0);
  const done = useRef(false);

  useEffect(() => {
    done.current = false;
    attempts.current = 0;
    let socket: WebSocket | null = null;
    let reconnectTimer: number | undefined;

    const connect = () => {
      socket = new WebSocket(`${WS_BASE_URL}/ws/progress/${taskId}`);
      socket.onmessage = (ev) => {
        try {
          const body = JSON.parse(ev.data);
          if (typeof body.progress === "number") {
            onProgress(body.progress, body.message ?? "");
            if (body.progress >= 100) {
              done.current = true;
              socket?.close();
            }
          }
        } catch {
          /* ignore malformed frames */
        }
      };
      socket.onclose = () => {
        if (done.current) return;
        attempts.current += 1;
        if (attempts.current > MAX_WS_RECONNECT_ATTEMPTS) {
          onSocketFailed();
          return;
        }
        const delay = Math.min(2 ** attempts.current * 1000, 10000);
        reconnectTimer = window.setTimeout(connect, delay);
      };
      socket.onerror = () => socket?.close();
    };

    connect();
    return () => {
      done.current = true;
      if (reconnectTimer) window.clearTimeout(reconnectTimer);
      socket?.close();
    };
  }, [taskId, onProgress, onSocketFailed]);

  return null;
}
