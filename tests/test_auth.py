"""Control-surface auth gate — accept/reject table pinned to the
reference middleware (middleware/auth.js:13-24) and its wiring into the
api functions (every reference route passes auth.validate;
routes/config.js:12, routes/queues.js:11, routes/deadletters.js:30,
routes/status.js:10)."""

import pytest

from raycrawl import api
from raycrawl.state import auth


@pytest.fixture(autouse=True)
def _reset_gate():
    """Tests own the module state; always restore the open default."""
    yield
    auth.initialize(None, force=False)


def test_open_by_default_like_localhost():
    # !token && !force -> next() (middleware/auth.js:15-17)
    auth.initialize(None, force=False)
    auth.validate()  # no token presented
    auth.validate("anything")  # presented tokens are ignored when open


def test_token_required_when_configured():
    auth.initialize("secret")
    auth.validate("secret")
    with pytest.raises(auth.AuthenticationError):
        auth.validate()
    with pytest.raises(auth.AuthenticationError):
        auth.validate("wrong")


def test_force_without_token_locks_everything():
    # force=true, token=null: the reference's header compare
    # (undefined === null) can never succeed -> always 403
    auth.initialize(None, force=True)
    with pytest.raises(auth.AuthenticationError):
        auth.validate()
    with pytest.raises(auth.AuthenticationError):
        auth.validate("secret")


def test_rotation_revokes_old_token():
    # routes/config.js:30 POST /tokens analogue: re-initialize with a
    # new token; the old one stops working immediately
    auth.initialize("old")
    auth.validate("old")
    auth.initialize("new")
    auth.validate("new")
    with pytest.raises(auth.AuthenticationError):
        auth.validate("old")


def test_api_functions_are_guarded(tmp_path):
    """The state-dir surfaces honor the gate end-to-end: open by
    default, 403 with a configured token and no/wrong x_token, pass
    with the right one — without engines or Ray."""
    sd = str(tmp_path)
    assert api.doc_count(sd) == 0  # open default

    auth.initialize("s3cr3t")
    with pytest.raises(auth.AuthenticationError):
        api.doc_count(sd)
    with pytest.raises(auth.AuthenticationError):
        api.deadletter_list(sd, x_token="nope")
    with pytest.raises(auth.AuthenticationError):
        api.metrics_series(sd, "done")
    with pytest.raises(auth.AuthenticationError):
        api.trace_log(sd)

    assert api.doc_count(sd, x_token="s3cr3t") == 0
    assert api.deadletter_count(sd, x_token="s3cr3t") == 0
    assert api.metrics_series(sd, "done", x_token="s3cr3t").num_rows == 0
    assert api.doc_list(sd, x_token="s3cr3t").num_rows == 0
    assert api.latest_documents(sd, x_token="s3cr3t").num_rows == 0
    assert api.trace_log(sd, x_token="s3cr3t").num_rows == 0
