from .http import App, HTTPError, Request, Response, WebSocket

__all__ = ["App", "HTTPError", "Request", "Response", "WebSocket"]
