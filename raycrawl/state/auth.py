"""Control-surface authentication — the library analogue of the
reference's poor-man's token middleware (``middleware/auth.js:1-25``).

The reference guards EVERY control route (queues, requests, deadletters,
config, status — see ``routes/*.js``) with ``auth.validate``: requests
must carry an ``X-token`` header equal to the configured service token,
except when no token is configured (localhost dev) and force-auth is
off. ``app.js:15`` initializes it from ``CRAWLER_SERVICE_AUTH_TOKEN`` /
``CRAWLER_SERVICE_FORCE_AUTH``.

The rebuild's control surface is an in-process Python API rather than
HTTP, so the gate is opt-in module state with identical semantics:

- ``initialize(None, force=False)`` (the default) → open, exactly like
  the reference running on localhost with no token configured.
- ``initialize(token)`` → every guarded ``api.*`` call must pass
  ``x_token=token`` or it raises :class:`AuthenticationError` (the 403).
- ``initialize(None, force=True)`` → everything is refused, mirroring
  the reference's ``force`` branch where the header compare
  ``undefined === null`` can never succeed.

Comparison uses ``hmac.compare_digest`` — the one improvement over the
reference's ``===`` (constant-time, no timing side channel); the
accept/reject TABLE is identical and pinned in tests/test_auth.py.
"""

from __future__ import annotations

import hmac

_token: str | None = None
_force: bool = False


class AuthenticationError(PermissionError):
    """403 'Authentication required' analogue."""


def initialize(token: str | None, force: bool = False) -> None:
    """Configure the gate (``auth.initialize``, middleware/auth.js:7-11).

    Idempotent module state, like the reference's; call with
    ``(None, False)`` to return to the open localhost default."""
    global _token, _force
    _token = token
    _force = bool(force)


def validate(x_token: str | None = None) -> None:
    """Raise :class:`AuthenticationError` unless the caller may proceed
    (``auth.validate``, middleware/auth.js:13-24).

    Open when no token is configured and force is off; otherwise the
    presented ``x_token`` must equal the configured token — and with
    ``force`` set but no token configured, nothing can match (the
    reference's lockout behavior)."""
    if _token is None and not _force:
        return
    if (
        _token is not None
        and x_token is not None
        and hmac.compare_digest(_token, x_token)
    ):
        return
    raise AuthenticationError("Authentication required")


def guarded(fn):
    """Decorator applying ``validate`` to an api function: the wrapped
    function accepts an extra keyword-only ``x_token`` (the ``X-token``
    header analogue), checked before the body runs."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, x_token: str | None = None, **kwargs):
        validate(x_token)
        return fn(*args, **kwargs)

    doc = wrapper.__doc__ or ""
    wrapper.__doc__ = doc + (
        "\n\n    Guarded: accepts ``x_token=`` (middleware/auth.js "
        "X-token analogue); raises AuthenticationError when the gate "
        "is configured and the token does not match."
    )
    return wrapper
