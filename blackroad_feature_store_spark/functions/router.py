"""@mention → local-LLM routing, re-expressed from the reference's
``ollama_router.py`` (public behavior, surveyed in SURVEY.md §2.8
F12-F14 and §3.4).

Semantics preserved:
* triggers matched case-insensitively, longest alternative first, with
  NO word boundaries on the right (``@ollamaX`` still matches
  ``@ollama`` — ollama_router.py:41-50); ``email@example.com`` does not
  match because the pattern requires the literal ``@name`` sequence
  with its own ``@``, not a bare domain (tested in the reference).
* ``strip_triggers`` removes every occurrence and trims.
* ``query_ollama`` POSTs {model, prompt, stream:false} to
  ``{base_url}/api/generate`` and maps URL errors to ConnectionError
  (ollama_router.py:58-100).

Two surfaces: driver-side pure functions (reference parity) and column
expressions (``detect_trigger_col``/``strip_triggers_col``) so the same
routing runs over a DataFrame of texts JVM-side at corpus scale.
"""

from __future__ import annotations

import json
import os
import re
import urllib.error
import urllib.request
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# Trigger set and env-var configuration match the reference exactly
# (ollama_router.py:26-36) — its test corpus runs unmodified.
OLLAMA_TRIGGERS: frozenset = frozenset(
    {"@ollama", "@copilot", "@lucidia", "@blackboxprogramming"}
)
DEFAULT_TRIGGERS = tuple(sorted(OLLAMA_TRIGGERS))
DEFAULT_BASE_URL = os.environ.get("OLLAMA_BASE_URL", "http://localhost:11434")
DEFAULT_MODEL = os.environ.get("OLLAMA_MODEL", "llama3")
DEFAULT_TIMEOUT = 120.0


def _pattern(triggers: tuple[str, ...]) -> str:
    # Longest-first so "@llm2" style prefixes resolve like the
    # reference's alternation (ollama_router.py:41-44).
    alts = sorted(triggers, key=len, reverse=True)
    return "(" + "|".join(re.escape(t) for t in alts) + ")"


# The default alternation with the (?i) flag — longest-first, so it is
# textually reproducible in an oracle SQL regexp.
TRIGGER_PATTERN = "(?i)" + _pattern(DEFAULT_TRIGGERS)


def detect_trigger(
    text: str, triggers: tuple[str, ...] = DEFAULT_TRIGGERS
) -> Optional[str]:
    """First trigger mention in the text (lowercased), else None."""
    m = re.search(_pattern(triggers), text, re.IGNORECASE)
    return m.group(0).lower() if m else None


def strip_triggers(
    text: str, triggers: tuple[str, ...] = DEFAULT_TRIGGERS
) -> str:
    """Remove every trigger occurrence and trim."""
    return re.sub(_pattern(triggers), "", text, flags=re.IGNORECASE).strip()


def detect_trigger_col(
    text: Column, triggers: tuple[str, ...] = DEFAULT_TRIGGERS
) -> Column:
    """Column form of detect_trigger (NULL when absent)."""
    pat = "(?i)" + _pattern(triggers)
    hit = F.lower(F.regexp_extract(text, pat, 0))
    return F.when(hit == "", F.lit(None).cast("string")).otherwise(hit)


def strip_triggers_col(
    text: Column, triggers: tuple[str, ...] = DEFAULT_TRIGGERS
) -> Column:
    return F.trim(F.regexp_replace(text, "(?i)" + _pattern(triggers), ""))


def query_ollama(
    prompt: str,
    model: str = DEFAULT_MODEL,
    base_url: str = DEFAULT_BASE_URL,
    timeout: float = DEFAULT_TIMEOUT,
) -> dict[str, Any]:
    """POST to Ollama's /api/generate; URL errors → ConnectionError
    (reference ollama_router.py:58-100)."""
    payload = json.dumps(
        {"model": model, "prompt": prompt, "stream": False}
    ).encode("utf-8")
    req = urllib.request.Request(
        f"{base_url}/api/generate",
        data=payload,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.URLError as e:
        raise ConnectionError(f"Cannot reach Ollama at {base_url}: {e}") from e


def route(
    text: str,
    model: str = DEFAULT_MODEL,
    base_url: str = DEFAULT_BASE_URL,
    triggers: tuple[str, ...] = DEFAULT_TRIGGERS,
) -> dict[str, Any]:
    """Route a prompt: no trigger → {'routed': False, ...}; otherwise
    strip triggers and forward (reference ollama_router.py:103-130)."""
    trig = detect_trigger(text, triggers)
    if trig is None:
        return {"routed": False, "trigger": None, "response": None}
    cleaned = strip_triggers(text, triggers)
    resp = query_ollama(cleaned, model=model, base_url=base_url)
    return {"routed": True, "trigger": trig, "response": resp}
