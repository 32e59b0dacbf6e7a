"""Serving layer.

Byte-compatible reimplementation of the reference's FastAPI surface
(back/api.py:1555-2785) on a first-party asyncio HTTP/1.1 + WebSocket
micro-framework (http.py — FastAPI/uvicorn are not vendored in this image,
and the framework owns its runtime):

  http.py      HTTP server, router, multipart/form parsing, RFC6455 WebSocket
  app.py       the 15 routes + CORS + background cleanup
  tasks.py     task orchestration: marker-file protocol (progress.json,
               completed/error/cancelled/in_progress.txt) identical to the
               reference's, but the worker is an in-process executor thread
               against ONE loaded model bundle — models load once, not per
               task (the reference reloads them in every worker fork,
               back/api.py:1718)
  pdf.py       from-scratch PDF writer for the transcript export (reportlab
               replacement, back/api.py:141-288)
  urls.py      URL validation + download incl. the Google-Drive confirm-token
               flow (back/api.py:358-528)
"""
