"""Host-side text tokenization for the LLM conditioning path.

The device path needs static [B, L] int arrays; all string handling happens
here. Agent references use the `<A{i}>` special-token template (reference:
prosim/dataset/text_utils.py:1-2, tokenizer extension
text_attns.py:122-155 - 128 agent tokens appended to the vocabulary, no
BOS/EOS for the demo configuration).

Two backends:
  * HFTokenizer - a real Llama3 tokenizer loaded via transformers from a
    local path (no network); exact id parity with the reference.
  * ByteTokenizer - dependency-free fallback (UTF-8 bytes + agent tokens) so
    the text pipeline runs end-to-end without tokenizer files.
"""

import re
from typing import Dict, List, Optional

import numpy as np

AGENT_TEMPLATE = "<A{}>"
MAX_AGENT_NUM = 128
_AGENT_RE = re.compile(r"<A(\d+)>")


class ByteTokenizer:
    """UTF-8 byte-level tokenizer; agent token <A{i}> -> base_vocab + i."""

    def __init__(self, base_vocab: int = 512, num_agent_tokens: int = MAX_AGENT_NUM):
        self.base_vocab = base_vocab
        self.num_agent_tokens = num_agent_tokens

    @property
    def vocab_size(self):
        return self.base_vocab + self.num_agent_tokens

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        pos = 0
        for m in _AGENT_RE.finditer(text):
            ids.extend(b % self.base_vocab for b in text[pos:m.start()].encode())
            ids.append(self.base_vocab + int(m.group(1)) % self.num_agent_tokens)
            pos = m.end()
        ids.extend(b % self.base_vocab for b in text[pos:].encode())
        return ids

    def agent_token_id(self, i: int) -> int:
        return self.base_vocab + i


class HFTokenizer:
    """Llama3 tokenizer via transformers from a local directory, extended
    with the 128 <A{i}> tokens (matching the reference's added-token layout:
    agent token i gets id base_vocab + i)."""

    def __init__(self, path: str, num_agent_tokens: int = MAX_AGENT_NUM,
                 add_bos_eos: bool = False):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.base_vocab = len(self.tok)
        self.num_agent_tokens = num_agent_tokens
        self.tok.add_special_tokens(
            {"additional_special_tokens": [AGENT_TEMPLATE.format(i) for i in range(num_agent_tokens)]}
        )
        self.add_bos_eos = add_bos_eos

    @property
    def vocab_size(self):
        return self.base_vocab + self.num_agent_tokens

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=self.add_bos_eos)

    def agent_token_id(self, i: int) -> int:
        return self.tok.convert_tokens_to_ids(AGENT_TEMPLATE.format(i))


def tokenize_batch(
    tokenizer,
    texts: List[str],
    max_len: int,
    num_agents: int,
    prompt_masks: Optional[np.ndarray] = None,  # [B, N]
) -> Dict[str, np.ndarray]:
    """Texts -> static device arrays.

    Returns input_ids [B, L], token_mask [B, L], agent_slot_ids [B, L]
    (agent index at <A{i}> positions else -1), prompt_mask [B, N].
    """
    B = len(texts)
    ids = np.zeros((B, max_len), np.int32)
    mask = np.zeros((B, max_len), bool)
    slots = -np.ones((B, max_len), np.int32)
    pmask = (
        prompt_masks.astype(bool)
        if prompt_masks is not None
        else np.zeros((B, num_agents), bool)
    )

    base = tokenizer.base_vocab
    for b, text in enumerate(texts):
        # LEFT truncation: overlong prompts keep their tail, matching the
        # reference tokenizer setup (truncation_side='left',
        # reference: text_attns.py:128-130)
        enc = tokenizer.encode(text)[-max_len:]
        n = len(enc)
        ids[b, :n] = enc
        mask[b, :n] = True
        for j, t in enumerate(enc):
            if t >= base:
                a = t - base
                if a < num_agents:
                    slots[b, j] = a
                    if prompt_masks is None:
                        pmask[b, a] = True
    return {
        "input_ids": ids,
        "token_mask": mask,
        "agent_slot_ids": slots,
        "prompt_mask": pmask,
    }


def build_text_prompt(agent_instructions: Dict[int, str]) -> str:
    """Compose a OneText scene prompt from per-agent instructions, e.g.
    {11: 'stop moving'} -> '<A11> stop moving.' (reference notebook helper
    `text_control`, prosim_demo/text_prompt_inference.ipynb cell 1)."""
    lines = []
    for idx, instr in agent_instructions.items():
        token = AGENT_TEMPLATE.format(idx)
        if token not in instr:
            instr = f"{token} {instr}"
        lines.append(instr if instr.endswith(".") else instr + ".")
    return "\n".join(lines)


def build_qa_batch(
    tokenizer,
    gt_xy: np.ndarray,       # [B, N, 2] ground-truth attribute per agent
    valid: np.ndarray,       # [B, N] bool
    max_len: int,
    rng,
    question_type: str = "position",
    contextual: bool = True,
) -> Dict[str, np.ndarray]:
    """QA probing inputs (reference: text_attns.py:577-607 _prepare_qa_text):
    per scene pick one valid agent, ask for its GT attribute, supervise the
    answer tokens. Returns tokenize_batch-style arrays plus labels [B, L]
    (-100 outside the answer span)."""
    B, N = valid.shape
    ids = np.zeros((B, max_len), np.int32)
    mask = np.zeros((B, max_len), bool)
    slots = -np.ones((B, max_len), np.int32)
    labels = np.full((B, max_len), -100, np.int32)
    nidxs = np.zeros((B,), np.int32)
    base = tokenizer.base_vocab

    for b in range(B):
        vi = np.nonzero(valid[b])[0]
        n = int(rng.choice(vi)) if len(vi) else 0
        nidxs[b] = n
        q = f" Question: {question_type} of agent {AGENT_TEMPLATE.format(n)} is?"
        if contextual:
            q += f" given embedding of {AGENT_TEMPLATE.format(n)} |"
        a = f"Answer:({gt_xy[b, n, 0]:.2f}, {gt_xy[b, n, 1]:.2f})"
        q_ids = tokenizer.encode(q)
        a_ids = tokenizer.encode(a)
        enc = (q_ids + a_ids)[:max_len]
        L = len(enc)
        ids[b, :L] = enc
        mask[b, :L] = True
        a_start = min(len(q_ids), L)
        labels[b, a_start:L] = enc[a_start:L]
        for j, t in enumerate(enc):
            if t >= base and t - base < N:
                slots[b, j] = t - base
    return {
        "input_ids": ids,
        "token_mask": mask,
        "agent_slot_ids": slots,
        "labels": labels,
        "query_agent": nidxs,
    }


_BLOCK_WIDTH = {"none": 1, "add": 1, "concat": 2, "concat_repeat": 3,
                "concat_sep": 4, "concat_semantic": 4}


def append_prompt_block(
    cond: Dict[str, np.ndarray],
    tokenizer,
    mode: str = "none",
    block_mask: "np.ndarray" = None,
) -> Dict[str, np.ndarray]:
    """Append the USE_PROMPT_TOKEN block after the text tokens
    (reference: text_attns.py:261-345): one group per agent slot whose layout
    depends on `mode` -- 'none' [emb], 'add' [name+emb], 'concat'
    [name, emb], 'concat_repeat' [name, emb, name], 'concat_sep'
    [name, '|', emb, ';'], 'concat_semantic' [name, 'is', emb, ','].

    Positions carrying the agent embedding get agent_slot_ids = agent index
    (the device side substitutes or adds the projected policy embedding
    there); `read_positions` [B, N] marks where to read each agent's output
    hidden state (-1 for agents outside the block).

    `block_mask` [B, N] selects which agents get a block slot; default is the
    condition's prompt_mask (USE_TEXT_PROMPT_MASK=True semantics) -- the
    reference default covers ALL valid prompt agents instead
    (text_attns.py:166-170), pass the agent-validity mask for that.
    """
    if mode not in _BLOCK_WIDTH:
        raise ValueError(f"unknown agent_token_mode '{mode}'")
    w = _BLOCK_WIDTH[mode]
    ids, mask, slots = cond["input_ids"], cond["token_mask"], cond["agent_slot_ids"]
    pmask = cond["prompt_mask"] if block_mask is None else np.asarray(block_mask)
    B, L = ids.shape
    N = pmask.shape[1]

    sep1 = sep2 = 0
    if mode == "concat_sep":
        sep1, sep2 = tokenizer.encode("|")[0], tokenizer.encode(";")[0]
    elif mode == "concat_semantic":
        sep1, sep2 = tokenizer.encode("is")[0], tokenizer.encode(",")[0]

    ids2 = np.concatenate([ids, np.zeros((B, w * N), np.int32)], axis=1)
    mask2 = np.concatenate([mask, np.zeros((B, w * N), bool)], axis=1)
    slots2 = np.concatenate([slots, -np.ones((B, w * N), np.int32)], axis=1)
    read = -np.ones((B, N), np.int32)

    for b in range(B):
        for n in range(N):
            if not pmask[b, n]:
                continue
            p = L + w * n
            name_id = tokenizer.agent_token_id(n)
            if mode in ("none", "add"):
                ids2[b, p] = name_id
                slots2[b, p] = n
                read[b, n] = p
            elif mode == "concat":
                ids2[b, p:p + 2] = [name_id, name_id]
                slots2[b, p + 1] = n
                read[b, n] = p + 1
            elif mode == "concat_repeat":
                ids2[b, p:p + 3] = [name_id, name_id, name_id]
                slots2[b, p + 1] = n
                read[b, n] = p + 1
            else:  # concat_sep / concat_semantic
                ids2[b, p:p + 4] = [name_id, sep1, name_id, sep2]
                slots2[b, p + 2] = n
                read[b, n] = p + 2
            mask2[b, p:p + w] = True

    out = dict(cond)
    out.update(input_ids=ids2, token_mask=mask2, agent_slot_ids=slots2,
               read_positions=read)
    return out
