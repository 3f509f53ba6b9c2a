"""Pluggable VLM verifier stage.

The reference's LLaVA gate (code/union_clip_llava2.py:104-130): prompt the
VLM "Does this image contain a {category}?", decode greedily at temperature
0, and treat the answer as positive iff "yes" appears in the lowercased
output (:127-130). SURVEY.md §7 stages the 7B VLM itself as a pluggable
interface (endpoint or stub) first; the cascade semantics live here so any
backend — a TPU-hosted VLM, an HTTP endpoint, or a test stub — slots in.
"""

from __future__ import annotations

from typing import Callable, Dict, Protocol, Sequence

DEFAULT_PROMPT = "Does this image contain a {category}?"
STRICT_PROMPT = (
    "Does this image contain a {category}? "
    "Answer with ONLY a single word: 'yes' or 'no'."
)


def parse_yes_no(output: str) -> bool:
    """The reference's answer parse: `"yes" in output.lower()`
    (code/union_clip_llava2.py:127-130)."""
    return "yes" in output.lower()


class Verifier(Protocol):
    def verify(self, image_path: str, category: str) -> bool:
        """True iff the VLM confirms the image contains the category."""
        ...


class StubVerifier:
    """Deterministic test/bring-up stub: answers from a lookup, default yes.

    Keys: (image_path, category) first, then image_path alone."""

    def __init__(self, answers: Dict = None, default: bool = True):
        self.answers = answers or {}
        self.default = default
        self.calls: list = []

    def verify(self, image_path: str, category: str) -> bool:
        self.calls.append((image_path, category))
        if (image_path, category) in self.answers:
            return self.answers[(image_path, category)]
        if image_path in self.answers:
            return self.answers[image_path]
        return self.default


class CallableVerifier:
    """Adapts any `generate(image_path, prompt) -> str` function (an HTTP
    endpoint client, a local VLM decode loop) into the Verifier protocol,
    applying the reference prompt template and yes-parse."""

    def __init__(self, generate: Callable[[str, str], str],
                 prompt_template: str = DEFAULT_PROMPT):
        self.generate = generate
        self.prompt_template = prompt_template

    def verify(self, image_path: str, category: str) -> bool:
        prompt = self.prompt_template.format(category=category)
        return parse_yes_no(self.generate(image_path, prompt))
