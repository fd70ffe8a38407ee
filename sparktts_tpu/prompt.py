"""Prompt assembly and token-id arithmetic.

Replaces the reference's string-level prompt templating + text-decode + regex
extraction round-trip (reference `cli/SparkTTS.py:53-155` and `:213-228`) with
direct token-id arithmetic: every `<|bicodec_semantic_N|>` /
`<|bicodec_global_N|>` is a single tokenizer id at a contiguous base offset,
so audio-token ↔ LLM-token conversion is addition — no host text detour
(SURVEY.md §3.1 flags that detour as the thing to eliminate).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sparktts_tpu.utils.tokens import GENDER_MAP, LEVELS_MAP, TASK_TOKEN_MAP

_CONTROL_TOKENS = [
    "<|start_content|>",
    "<|end_content|>",
    "<|start_global_token|>",
    "<|end_global_token|>",
    "<|start_semantic_token|>",
    "<|end_semantic_token|>",
    "<|start_style_label|>",
    "<|end_style_label|>",
]

_SPECIAL_RE = re.compile(r"<\|[^|]+\|>")


class SparkTokenizerBase:
    """Interface both tokenizer backends implement."""

    semantic_base: int
    global_base: int
    n_semantic: int
    n_global: int
    eos_ids: Tuple[int, ...]
    pad_id: int

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int]) -> str:
        raise NotImplementedError

    def token_id(self, token: str) -> int:
        raise NotImplementedError


class HFSparkTokenizer(SparkTokenizerBase):
    """Wraps the checkpoint's HF tokenizer (reference `cli/SparkTTS.py:48`)
    and discovers the contiguous special-token id ranges once at init."""

    def __init__(self, model_dir: str | Path, n_semantic: int = 8192, n_global: int = 4096):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(f"{model_dir}/LLM")
        self.semantic_base = self.tok.convert_tokens_to_ids("<|bicodec_semantic_0|>")
        self.global_base = self.tok.convert_tokens_to_ids("<|bicodec_global_0|>")
        # verify contiguity so id arithmetic is safe
        for probe in (1, 100):
            assert (
                self.tok.convert_tokens_to_ids(f"<|bicodec_semantic_{probe}|>")
                == self.semantic_base + probe
            ), "semantic token ids are not contiguous"
        assert (
            self.tok.convert_tokens_to_ids("<|bicodec_global_1|>") == self.global_base + 1
        ), "global token ids are not contiguous"
        self.n_semantic = n_semantic
        self.n_global = n_global
        eos = self.tok.eos_token_id
        self.eos_ids = tuple(eos) if isinstance(eos, (list, tuple)) else (eos,)
        self.pad_id = self.tok.pad_token_id if self.tok.pad_token_id is not None else self.eos_ids[0]

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(list(ids))

    def token_id(self, token: str) -> int:
        return self.tok.convert_tokens_to_ids(token)


class SyntheticSparkTokenizer(SparkTokenizerBase):
    """Deterministic checkpoint-free tokenizer for tests/benchmarks.

    Layout: [0..255] raw bytes, then control/task/attribute specials, then
    8192 semantic ids, then 4096 global ids.  Behaves like the HF tokenizer
    for every operation the pipeline needs (specials are single ids, text is
    byte-level).
    """

    def __init__(self, n_semantic: int = 8192, n_global: int = 4096):
        specials: List[str] = ["<|im_end|>", "<|endoftext|>"]
        specials += list(TASK_TOKEN_MAP.values())
        specials += _CONTROL_TOKENS
        specials += [f"<|gender_{i}|>" for i in range(len(GENDER_MAP))]
        specials += [f"<|pitch_label_{i}|>" for i in range(len(LEVELS_MAP))]
        specials += [f"<|speed_label_{i}|>" for i in range(len(LEVELS_MAP))]
        self._special_to_id: Dict[str, int] = {s: 256 + i for i, s in enumerate(specials)}
        self._id_to_special = {v: k for k, v in self._special_to_id.items()}
        base = 256 + len(specials)
        self.semantic_base = base
        self.n_semantic = n_semantic
        self.global_base = base + n_semantic
        self.n_global = n_global
        self.vocab_size = self.global_base + n_global
        self.eos_ids = (self._special_to_id["<|im_end|>"],)
        self.pad_id = self._special_to_id["<|endoftext|>"]

    def token_id(self, token: str) -> int:
        if token in self._special_to_id:
            return self._special_to_id[token]
        m = re.match(r"<\|bicodec_semantic_(\d+)\|>", token)
        if m:
            return self.semantic_base + int(m.group(1))
        m = re.match(r"<\|bicodec_global_(\d+)\|>", token)
        if m:
            return self.global_base + int(m.group(1))
        raise KeyError(token)

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        pos = 0
        for m in _SPECIAL_RE.finditer(text):
            ids.extend(text[pos : m.start()].encode("utf-8"))
            ids.append(self.token_id(m.group(0)))
            pos = m.end()
        ids.extend(text[pos:].encode("utf-8"))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        out: List[str] = []
        byte_buf: List[int] = []

        def flush():
            if byte_buf:
                out.append(bytes(byte_buf).decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            i = int(i)
            if i < 256:
                byte_buf.append(i)
            elif i in self._id_to_special:
                flush()
                out.append(self._id_to_special[i])
            elif self.semantic_base <= i < self.semantic_base + self.n_semantic:
                flush()
                out.append(f"<|bicodec_semantic_{i - self.semantic_base}|>")
            elif self.global_base <= i < self.global_base + self.n_global:
                flush()
                out.append(f"<|bicodec_global_{i - self.global_base}|>")
        flush()
        return "".join(out)


# ---------------------------------------------------------------------------
# prompt builders (id-level)
# ---------------------------------------------------------------------------


def build_clone_prompt(
    tok: SparkTokenizerBase,
    text: str,
    global_tokens: np.ndarray,     # (N,) codec global ids
    semantic_tokens: Optional[np.ndarray] = None,  # (T,) codec semantic ids
    prompt_text: Optional[str] = None,
) -> List[int]:
    """Voice-cloning prompt, id-level equivalent of reference
    `cli/SparkTTS.py:53-108` (same token sequence as string-assembly +
    tokenizer.encode since specials never merge with text)."""
    ids: List[int] = []
    ids.append(tok.token_id(TASK_TOKEN_MAP["tts"]))
    ids.append(tok.token_id("<|start_content|>"))
    if prompt_text is not None:
        ids.extend(tok.encode(prompt_text + text))
    else:
        ids.extend(tok.encode(text))
    ids.append(tok.token_id("<|end_content|>"))
    ids.append(tok.token_id("<|start_global_token|>"))
    ids.extend(int(g) + tok.global_base for g in np.asarray(global_tokens).reshape(-1))
    ids.append(tok.token_id("<|end_global_token|>"))
    if prompt_text is not None and semantic_tokens is not None:
        ids.append(tok.token_id("<|start_semantic_token|>"))
        ids.extend(
            int(s) + tok.semantic_base for s in np.asarray(semantic_tokens).reshape(-1)
        )
    return ids


def build_control_prompt(
    tok: SparkTokenizerBase,
    text: str,
    gender: str,
    pitch: str,
    speed: str,
) -> List[int]:
    """Controllable voice-creation prompt (reference `cli/SparkTTS.py:110-155`)."""
    assert gender in GENDER_MAP and pitch in LEVELS_MAP and speed in LEVELS_MAP
    ids: List[int] = []
    ids.append(tok.token_id(TASK_TOKEN_MAP["controllable_tts"]))
    ids.append(tok.token_id("<|start_content|>"))
    ids.extend(tok.encode(text))
    ids.append(tok.token_id("<|end_content|>"))
    ids.append(tok.token_id("<|start_style_label|>"))
    ids.append(tok.token_id(f"<|gender_{GENDER_MAP[gender]}|>"))
    ids.append(tok.token_id(f"<|pitch_label_{LEVELS_MAP[pitch]}|>"))
    ids.append(tok.token_id(f"<|speed_label_{LEVELS_MAP[speed]}|>"))
    ids.append(tok.token_id("<|end_style_label|>"))
    return ids


def clone_prompt_scaffold(
    tok: SparkTokenizerBase,
    text: str,
    n_global: int,
    n_semantic: int,
    prompt_text: Optional[str] = None,
    t_pad: Optional[int] = None,
) -> Tuple[np.ndarray, int, int, int]:
    """Host-known half of a clone prompt, for DEVICE-side assembly.

    Every id in the clone prompt except the audio tokens themselves is known
    on the host without reading the codec's output (the audio-token COUNTS
    are deterministic functions of the wav length), so admission can chain
    tokenize → assemble → prefill as pure device dispatches with zero host
    syncs — on a tunneled TPU each sync costs a full relay round-trip.
    Returns (scaffold (t_pad,) int32 right-padded with pad_id, prompt_len,
    global_offset, semantic_offset); positions [global_offset,
    global_offset+n_global) and [semantic_offset, semantic_offset+n_semantic)
    hold pad_id placeholders the device fills in (`assemble_clone_ids`).
    Token order matches `build_clone_prompt` exactly."""
    head: List[int] = [tok.token_id(TASK_TOKEN_MAP["tts"]), tok.token_id("<|start_content|>")]
    head.extend(tok.encode(prompt_text + text if prompt_text is not None else text))
    head.append(tok.token_id("<|end_content|>"))
    head.append(tok.token_id("<|start_global_token|>"))
    g_off = len(head)
    tail: List[int] = [tok.token_id("<|end_global_token|>")]
    if prompt_text is not None:
        tail.append(tok.token_id("<|start_semantic_token|>"))
    else:
        n_semantic = 0
    s_off = g_off + n_global + len(tail)
    prompt_len = s_off + n_semantic
    if t_pad is None:
        t_pad = prompt_len
    assert t_pad >= prompt_len, (t_pad, prompt_len)
    scaffold = np.full(t_pad, tok.pad_id, np.int32)
    scaffold[:g_off] = head
    scaffold[g_off + n_global : s_off] = tail
    return scaffold, prompt_len, g_off, s_off


# ---------------------------------------------------------------------------
# extraction (arithmetic replacement for the regex path)
# ---------------------------------------------------------------------------


def extract_semantic_ids(tok: SparkTokenizerBase, generated: np.ndarray) -> np.ndarray:
    """Generated LLM ids → codec semantic ids, order-preserving
    (replaces reference `cli/SparkTTS.py:213-220` regex)."""
    g = np.asarray(generated).reshape(-1)
    mask = (g >= tok.semantic_base) & (g < tok.semantic_base + tok.n_semantic)
    return (g[mask] - tok.semantic_base).astype(np.int32)


def extract_global_ids(tok: SparkTokenizerBase, generated: np.ndarray) -> np.ndarray:
    """Generated LLM ids → codec global ids (controllable mode emits these;
    reference `cli/SparkTTS.py:222-228`)."""
    g = np.asarray(generated).reshape(-1)
    mask = (g >= tok.global_base) & (g < tok.global_base + tok.n_global)
    return (g[mask] - tok.global_base).astype(np.int32)


def padded_global_tokens(
    tok: SparkTokenizerBase, generated: np.ndarray, token_num: int, warn: bool = False
) -> np.ndarray:
    """(1, token_num) speaker tokens from a generated stream, zero-padded when
    the LLM emitted fewer than token_num globals (controllable mode; reference
    `cli/SparkTTS.py:222-228`).  The single source for this contract — the
    pipeline and every serving path share it."""
    g = extract_global_ids(tok, generated)
    if g.size < token_num:
        if warn:
            import logging

            logging.getLogger(__name__).warning(
                "controllable mode generated %d/%d global tokens; zero-padding",
                g.size, token_num,
            )
        g = np.pad(g, (0, token_num - g.size))
    return g[None, :token_num]
