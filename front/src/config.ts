// Runtime configuration (reference contract: front/src/config.ts).
export const API_BASE_URL =
  import.meta.env.VITE_API_BASE_URL ?? "http://localhost:8000";
export const WS_BASE_URL =
  import.meta.env.VITE_WS_BASE_URL ??
  API_BASE_URL.replace(/^http/, "ws");
export const MAX_FILE_SIZE_MB = 25;
export const MAX_FILE_SIZE_BYTES = MAX_FILE_SIZE_MB * 1024 * 1024;
export const STATUS_POLL_INTERVAL_MS = 2000;
export const MAX_WS_RECONNECT_ATTEMPTS = 5;
