"""Native Mistral 'tekken' tokenizer: reads the ``tekken.json`` shipped in
Mistral-format checkpoints (Mistral-Small/Large, Pixtral, Ministral, ...)
directly on tiktoken's BPE machinery — no ``mistral_common`` dependency.

Parity: aphrodite/transformers_utils/tokenizers/mistral.py (which wraps
mistral_common's TekkenTokenizer). File format per the public
mistral-common serialization: ``config`` (pattern, default_vocab_size,
default_num_special_tokens, version), ``vocab`` (rank + base64
token_bytes), optional ``special_tokens``. Token-id layout: special ids
occupy [0, num_special); byte-vocab token id = rank + num_special.

Legacy sentencepiece checkpoints (``tokenizer.model.v1/v3``) are not
readable here (sentencepiece is not available in this environment) — those
models ship HF tokenizer.json conversions, which the default path loads.
"""
from __future__ import annotations

import base64
import json
import os
from typing import Optional

# mistral-common's deprecated default special-token list (pre-v7 files
# without an explicit special_tokens section).
_LEGACY_SPECIALS = [
    "<unk>", "<s>", "</s>", "[INST]", "[/INST]",
    "[AVAILABLE_TOOLS]", "[/AVAILABLE_TOOLS]",
    "[TOOL_RESULTS]", "[/TOOL_RESULTS]", "[TOOL_CALLS]",
    "[IMG]", "<pad>", "[IMG_BREAK]", "[IMG_END]",
    "[PREFIX]", "[MIDDLE]", "[SUFFIX]",
    "[SYSTEM_PROMPT]", "[/SYSTEM_PROMPT]", "[TOOL_CONTENT]",
]


def find_tekken_file(path: str) -> Optional[str]:
    if os.path.isfile(path) and os.path.basename(path).startswith("tekken"):
        return path
    if os.path.isdir(path):
        cand = os.path.join(path, "tekken.json")
        if os.path.isfile(cand):
            return cand
    return None


class TekkenTokenizer:
    """HF-tokenizer-compatible surface over a tekken.json file."""

    def __init__(self, tekken_file: str) -> None:
        import tiktoken
        with open(tekken_file) as f:
            data = json.load(f)
        cfg = data["config"]
        ns = cfg["default_num_special_tokens"]
        vocab_size = cfg["default_vocab_size"]
        self.version = cfg.get("version", "")
        self.vocab_size = vocab_size
        self._num_special = ns

        vocab = data["vocab"][:vocab_size - ns]
        ranks = {base64.b64decode(e["token_bytes"]): e["rank"] + ns
                 for e in vocab}

        specials = data.get("special_tokens")
        if specials is None:
            specials = [{"rank": i, "token_str": s, "is_control": True}
                        for i, s in enumerate(_LEGACY_SPECIALS)]
        by_rank = {e["rank"]: e["token_str"] for e in specials}
        self._special_str = {r: by_rank.get(r, f"<SPECIAL_{r}>")
                             for r in range(ns)}
        self._special_id = {s: r for r, s in self._special_str.items()}
        self.all_special_ids = set(range(ns))

        self._enc = tiktoken.Encoding(
            name=os.path.basename(tekken_file),
            pat_str=cfg["pattern"],
            mergeable_ranks=ranks,
            special_tokens=self._special_id)

        self.bos_token = "<s>"
        self.eos_token = "</s>"
        self.bos_token_id = self._special_id.get("<s>", 1)
        self.eos_token_id = self._special_id.get("</s>", 2)
        self.unk_token_id = self._special_id.get("<unk>", 0)
        self.pad_token_id = self._special_id.get("<pad>")
        self.is_fast = False
        self.chat_template = "tekken-native"  # truthy: server chat works

    # ------------------------------------------------------------- encoding
    def __len__(self) -> int:
        return self.vocab_size

    def get_vocab(self) -> dict:
        vocab = {s: r for s, r in self._special_id.items()}
        for b, r in self._enc._mergeable_ranks.items():
            vocab[b.decode("utf-8", errors="replace")] = r
        return vocab

    def encode(self, text: str, add_special_tokens: bool = True,
               split_special_tokens: bool = False, **kw) -> list[int]:
        """Special-token strings in the text map to their control ids by
        DEFAULT — this matches HF fast tokenizers (their default also
        tokenizes in-content special strings as specials) and keeps the
        templated-text -> ids server path faithful. Pass
        split_special_tokens=True (the HF kwarg) to treat untrusted text
        literally: special strings then encode as plain bytes."""
        if split_special_tokens:
            ids = self._enc.encode(text, disallowed_special=())
        else:
            ids = self._enc.encode(text, allowed_special="all")
        if add_special_tokens and (not ids or ids[0] != self.bos_token_id):
            ids = [self.bos_token_id] + ids
        return ids

    def decode(self, ids, skip_special_tokens: bool = True,
               spaces_between_special_tokens: bool = True, **kw) -> str:
        ids = list(ids)
        if skip_special_tokens:
            ids = [i for i in ids if i >= self._num_special]
        out = []
        run: list[int] = []
        for i in ids:
            if i < self._num_special:
                if run:
                    out.append(self._enc.decode(run))
                    run = []
                out.append(self._special_str[i])
            else:
                run.append(i)
        if run:
            out.append(self._enc.decode(run))
        return "".join(out)

    def convert_ids_to_tokens(self, ids, skip_special_tokens: bool = False):
        single = isinstance(ids, int)
        if single:
            ids = [ids]
        toks = []
        for i in ids:
            if i < self._num_special:
                if not skip_special_tokens:
                    toks.append(self._special_str[i])
            else:
                b = self._enc.decode_single_token_bytes(i)
                toks.append(b.decode("utf-8", errors="replace"))
        return toks[0] if single else toks

    def convert_tokens_to_string(self, tokens) -> str:
        return "".join(tokens)

    # -------------------------------------------------------- chat template
    def apply_chat_template(self, messages, tokenize: bool = False,
                            add_generation_prompt: bool = True,
                            chat_template: Optional[str] = None,
                            tools: Optional[list] = None, **kw):
        """Mistral instruct format rendered as text whose special-token
        markers encode() maps back to control ids (reference: mistral_common
        InstructRequest encoding; v7+ uses [SYSTEM_PROMPT], older versions
        fold the system message into the first user turn)."""
        has_sys_tok = "[SYSTEM_PROMPT]" in self._special_id
        parts = ["<s>"]
        system = None
        msgs = []
        for m in messages:
            c = m.get("content") or ""
            if isinstance(c, list):  # content-part lists
                c = "".join(p.get("text", "") for p in c
                            if isinstance(p, dict))
            msgs.append({**m, "content": c})
        if msgs and msgs[0]["role"] == "system":
            system = msgs[0]["content"]
            msgs = msgs[1:]
        if system is not None and has_sys_tok:
            parts.append(f"[SYSTEM_PROMPT]{system}[/SYSTEM_PROMPT]")
            system = None
        last_user = max((i for i, m in enumerate(msgs)
                         if m["role"] == "user"), default=-1)
        for i, m in enumerate(msgs):
            role, content = m["role"], m["content"]
            if role == "user":
                if i == last_user and tools:
                    parts.append("[AVAILABLE_TOOLS]" +
                                 json.dumps(tools, separators=(",", ":")) +
                                 "[/AVAILABLE_TOOLS]")
                if system is not None and i == last_user:
                    content = f"{system}\n\n{content}"
                parts.append(f"[INST]{content}[/INST]")
            elif role == "assistant":
                calls = m.get("tool_calls")
                if calls:
                    norm = [{"name": c["function"]["name"],
                             "arguments": c["function"]["arguments"],
                             **({"id": c["id"]} if c.get("id") else {})}
                            for c in calls]
                    parts.append("[TOOL_CALLS]" +
                                 json.dumps(norm, separators=(",", ":")))
                if content:
                    parts.append(content)
                parts.append("</s>")
            elif role in ("tool", "tool_results"):
                parts.append(f"[TOOL_RESULTS]{content}[/TOOL_RESULTS]")
            else:
                raise ValueError(f"unknown chat role {role!r}")
        text = "".join(parts)
        if tokenize:
            return self._enc.encode(text, allowed_special="all")
        return text
