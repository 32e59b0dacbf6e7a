// File-upload validation, extracted as pure functions so they are
// unit-testable without a DOM (VERDICT r3 next #7).
//
// Tier semantics mirror the reference component
// (reference front/src/components/FileUpload.tsx:26-64): primary formats
// (.wav/.mp3 — fully supported) and secondary formats that may require
// server-side conversion. A file passes when EITHER its extension OR its
// MIME type matches any tier.
//
// Reference quirk reproduced deliberately: the BACKEND's /upload-file
// still accepts only .mp3/.wav (back/api.py:1766 — our serve/app.py
// matches), so a secondary-format pick passes client validation and is
// rejected server-side with 400, exactly as the reference behaves. The
// /upload-url path whitelists the secondary extensions on both sides.

import { MAX_FILE_SIZE_BYTES, MAX_FILE_SIZE_MB } from "./config";

export const PRIMARY_EXT = [".wav", ".mp3"];
export const PRIMARY_MIME = ["audio/wav", "audio/mpeg", "audio/mp3"];

export const SECONDARY_EXT = [
  ".mp4",
  ".webm",
  ".ogg",
  ".flac",
  ".m4a",
  ".aac",
];
export const SECONDARY_MIME = [
  "video/mp4",
  "audio/mp4",
  "audio/webm",
  "video/webm",
  "audio/ogg",
  "application/ogg",
  "audio/flac",
  "audio/m4a",
  "audio/aac",
];

export const ACCEPT_ATTR = [
  ...PRIMARY_EXT,
  ...SECONDARY_EXT,
  ...PRIMARY_MIME,
  ...SECONDARY_MIME,
].join(",");

export function isValidFileType(name: string, mime: string): boolean {
  const lower = name.toLowerCase();
  const extOk = [...PRIMARY_EXT, ...SECONDARY_EXT].some((e) =>
    lower.endsWith(e),
  );
  const mimeOk = [...PRIMARY_MIME, ...SECONDARY_MIME].includes(mime);
  return extOk || mimeOk;
}

/** Returns an error message, or null when the file is acceptable. */
export function validateFile(file: {
  name: string;
  type: string;
  size: number;
}): string | null {
  if (!isValidFileType(file.name, file.type)) {
    return "Invalid file type. Please use .wav or .mp3 files for best results.";
  }
  if (file.size > MAX_FILE_SIZE_BYTES) {
    return `File exceeds the ${MAX_FILE_SIZE_MB} MB limit (${(
      file.size / 1048576
    ).toFixed(2)} MB).`;
  }
  return null;
}
