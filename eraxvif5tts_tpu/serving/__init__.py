"""Serving layer: HTTP streaming server (stdlib asyncio — no FastAPI dependency)
and raw-TCP streaming server/client (reference `src/streaming/f5tts-fastapi-server.py`
and `src/f5_tts/socket_server.py`)."""
