"""Router behavior suite, corpus-driven.

Pins the same 20 externally-visible behaviors the reference's router
suite checks (reference tests/test_ollama_router.py:21-141) — trigger
detection/stripping, HTTP payload shape, error mapping, and routing —
but expressed as data tables driven through shared runners, plus the
Spark column forms this engine adds on top. The implementation under
test (functions/router.py) is an independent rewrite of the
reference's ollama_router.py.
"""

import json
import unittest.mock as mock
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from blackroad_feature_store_spark.functions.router import (
    OLLAMA_TRIGGERS,
    detect_trigger,
    detect_trigger_col,
    query_ollama,
    route,
    strip_triggers,
    strip_triggers_col,
)

BASE = "http://localhost:11434"

# One row per text: (text, trigger detect_trigger must return,
# strip_triggers result). Covers: each trigger word, case folding,
# multiple triggers in one text, no-trigger passthrough, and the
# email-address non-match.
TEXT_CORPUS = [
    ("@ollama what is the weather?", "@ollama", "what is the weather?"),
    ("Hey @copilot, explain this code", "@copilot", "Hey , explain this code"),
    ("@lucidia summarize my data", "@lucidia", "summarize my data"),
    ("@blackboxprogramming write a test", "@blackboxprogramming", "write a test"),
    # replace-all + end-trim only: the interior double space survives
    ("UPPER @OLLAMA case", "@ollama", "UPPER  case"),
    ("@ollama what is 2+2?", "@ollama", "what is 2+2?"),
    ("@copilot explain recursion", "@copilot", "explain recursion"),
    ("@lucidia @ollama clean both", "@lucidia", "clean both"),
    ("no trigger here", None, "no trigger here"),
    ("email@example.com", None, "email@example.com"),
]

CANNED_REPLY = {"model": "llama3", "response": "Hello!", "done": True}


@contextmanager
def fake_ollama(reply=None, error=None):
    """Patch urllib with a canned Ollama endpoint; yields a recorder
    exposing the Request objects and decoded JSON payloads sent."""

    class Recorder:
        requests: list = []

        @property
        def payloads(self):
            return [json.loads(r.data) for r in self.requests]

    rec = Recorder()
    if error is not None:
        patch = mock.patch("urllib.request.urlopen", side_effect=error)
        with patch:
            yield rec
        return

    def serve(req, timeout=None):
        rec.requests.append(req)
        resp = mock.MagicMock()
        resp.read.return_value = json.dumps(reply or CANNED_REPLY).encode()
        resp.__enter__ = lambda s: s
        resp.__exit__ = mock.MagicMock(return_value=False)
        return resp

    with mock.patch("urllib.request.urlopen", side_effect=serve):
        yield rec


# -- text behaviors, one runner over the corpus ------------------------------


@pytest.mark.parametrize("text,trigger,stripped", TEXT_CORPUS)
def test_detect_and_strip_corpus(text, trigger, stripped):
    assert detect_trigger(text) == trigger
    assert strip_triggers(text) == stripped


def test_first_of_multiple_triggers_wins():
    assert detect_trigger("@ollama and @copilot") in OLLAMA_TRIGGERS


def test_spark_column_forms_agree_with_python_over_corpus(spark):
    df = spark.createDataFrame(
        [(t,) for t, _, _ in TEXT_CORPUS], "text string"
    )
    out = df.select(
        "text",
        detect_trigger_col(F.col("text")).alias("trig"),
        strip_triggers_col(F.col("text")).alias("stripped"),
    )
    expected = {t: (trig, strip) for t, trig, strip in TEXT_CORPUS}
    for row in out.collect():
        assert (row["trig"], row["stripped"]) == expected[row["text"]]


# -- HTTP behaviors ----------------------------------------------------------


def test_generate_request_shape():
    with fake_ollama() as srv:
        out = query_ollama("hello", model="llama3", base_url=BASE)
    assert out == CANNED_REPLY
    (req,) = srv.requests
    assert req.full_url == f"{BASE}/api/generate"
    (payload,) = srv.payloads
    assert (payload["model"], payload["prompt"], payload["stream"]) == (
        "llama3", "hello", False,
    )


def test_unreachable_endpoint_maps_to_connection_error():
    import urllib.error

    with fake_ollama(error=urllib.error.URLError("refused")):
        with pytest.raises(ConnectionError, match="Cannot reach Ollama"):
            query_ollama("ping", base_url=BASE)


# -- routing behaviors -------------------------------------------------------


@pytest.mark.parametrize("trigger", sorted(OLLAMA_TRIGGERS))
def test_each_trigger_routes(trigger):
    with fake_ollama():
        out = route(f"{trigger} explain feature stores", base_url=BASE)
    assert (out["routed"], out["trigger"]) == (True, trigger.lower())


def test_routed_call_returns_endpoint_reply_and_strips_prompt():
    with fake_ollama() as srv:
        out = route("@copilot explain recursion", base_url=BASE)
    assert out == {
        "routed": True, "trigger": "@copilot", "response": CANNED_REPLY,
    }
    (payload,) = srv.payloads
    assert payload["prompt"] == "explain recursion"  # trigger stripped


def test_triggerless_text_never_calls_http():
    with fake_ollama() as srv:
        out = route("no mention here", base_url=BASE)
    assert out == {"routed": False, "trigger": None, "response": None}
    assert srv.requests == []  # short-circuits before any HTTP
