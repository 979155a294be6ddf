"""Chat-template registry (ref roll/datasets/chat_template.py:20-90): named
templates mapping a message list → prompt string with generation prompt."""

from __future__ import annotations

from typing import Callable, Dict, List

TEMPLATES: Dict[str, Callable] = {}


def register_template(name: str):
    def deco(fn):
        TEMPLATES[name] = fn
        return fn
    return deco


def get_chat_template(name: str) -> Callable:
    if name not in TEMPLATES:
        raise KeyError(f"unknown chat template {name!r}; have {sorted(TEMPLATES)}")
    return TEMPLATES[name]


@register_template("native")
@register_template("chatml")
@register_template("qwen2-vl")
def chatml(messages: List[Dict[str, str]],
           system: str = "You are a helpful assistant.") -> str:
    parts = []
    if system is not None and (not messages or messages[0].get("role") != "system"):
        parts.append(f"<|im_start|>system\n{system}<|im_end|>\n")
    for m in messages:
        parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    parts.append("<|im_start|>assistant\n")
    return "".join(parts)


@register_template("longcot")
def longcot(messages: List[Dict[str, str]], **kw) -> str:
    text = chatml(messages, **kw)
    return text + "<think>\n"


@register_template("base")
def base(messages: List[Dict[str, str]], **kw) -> str:
    return "\n".join(m["content"] for m in messages) + "\n"
