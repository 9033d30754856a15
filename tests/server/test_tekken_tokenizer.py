"""Native tekken tokenizer tests against a synthesized tekken.json
(format per the public mistral-common serialization; reference
transformers_utils/tokenizers/mistral.py)."""
import base64
import json

import pytest

from aphrodite_tpu.tokenizers_mistral import (TekkenTokenizer,
                                              find_tekken_file)

NS = 20  # default_num_special_tokens

SPECIALS = [
    "<unk>", "<s>", "</s>", "[INST]", "[/INST]",
    "[AVAILABLE_TOOLS]", "[/AVAILABLE_TOOLS]",
    "[TOOL_RESULTS]", "[/TOOL_RESULTS]", "[TOOL_CALLS]",
    "[IMG]", "<pad>", "[IMG_BREAK]", "[IMG_END]",
    "[PREFIX]", "[MIDDLE]", "[SUFFIX]",
    "[SYSTEM_PROMPT]", "[/SYSTEM_PROMPT]", "[TOOL_CONTENT]",
]


def write_tekken(path, with_specials=True):
    vocab = [{"rank": i, "token_bytes":
              base64.b64encode(bytes([i])).decode(), "token_str": None}
             for i in range(256)]
    for rank, merged in [(256, b"ab"), (257, b"abc"), (258, b"he"),
                         (259, b"ll"), (260, b"llo"), (261, b"hello")]:
        vocab.append({"rank": rank,
                      "token_bytes": base64.b64encode(merged).decode(),
                      "token_str": merged.decode()})
    data = {
        "config": {
            "pattern": r"[^\s]+|\s+",
            "default_vocab_size": NS + len(vocab),
            "default_num_special_tokens": NS,
            "version": "v7",
        },
        "vocab": vocab,
    }
    if with_specials:
        data["special_tokens"] = [
            {"rank": i, "token_str": s, "is_control": True}
            for i, s in enumerate(SPECIALS)]
    f = path / "tekken.json"
    f.write_text(json.dumps(data))
    return str(f)


@pytest.fixture
def tok(tmp_path):
    return TekkenTokenizer(write_tekken(tmp_path))


def test_merge_ranks_and_ids(tok):
    # "hello" is a single merged token: id = rank 261 + NS
    ids = tok.encode("hello", add_special_tokens=False)
    assert ids == [261 + NS]
    # "abc" merges via ab+c
    assert tok.encode("abc", add_special_tokens=False) == [257 + NS]
    # unknown word falls back to byte tokens
    assert tok.encode("xy", add_special_tokens=False) == \
        [ord("x") + NS, ord("y") + NS]


def test_bos_and_roundtrip(tok):
    ids = tok.encode("hello abc")
    assert ids[0] == tok.bos_token_id == 1
    assert tok.decode(ids) == "hello abc"
    assert tok.decode(ids, skip_special_tokens=False) == "<s>hello abc"


def test_special_tokens_in_text_map_to_control_ids(tok):
    ids = tok.encode("[INST]hello[/INST]", add_special_tokens=False)
    assert ids == [3, 261 + NS, 4]
    assert tok.decode(ids, skip_special_tokens=False) == \
        "[INST]hello[/INST]"
    assert tok.decode(ids) == "hello"


def test_legacy_file_without_specials_section(tmp_path):
    t = TekkenTokenizer(write_tekken(tmp_path, with_specials=False))
    assert t.bos_token_id == 1 and t.eos_token_id == 2
    assert t.encode("[TOOL_CALLS]", add_special_tokens=False) == [9]


def test_chat_template_v7(tok):
    text = tok.apply_chat_template(
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "hi"},
         {"role": "assistant", "content": "hello"},
         {"role": "user", "content": "more"}])
    assert text == ("<s>[SYSTEM_PROMPT]be brief[/SYSTEM_PROMPT]"
                    "[INST]hi[/INST]hello</s>[INST]more[/INST]")
    ids = tok.encode(text, add_special_tokens=False)
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.eos_token_id) == 1


def test_chat_template_tools(tok):
    tools = [{"type": "function", "function": {"name": "f"}}]
    text = tok.apply_chat_template(
        [{"role": "user", "content": "hi"},
         {"role": "assistant", "tool_calls": [
             {"id": "call12345", "type": "function",
              "function": {"name": "f", "arguments": "{}"}}]},
         {"role": "tool", "content": "42"},
         {"role": "user", "content": "and?"}],
        tools=tools)
    assert "[AVAILABLE_TOOLS]" in text and "[TOOL_CALLS]" in text
    assert "[TOOL_RESULTS]42[/TOOL_RESULTS]" in text
    # tools go before the LAST user turn
    assert text.index("[AVAILABLE_TOOLS]") > text.index("[TOOL_RESULTS]")


def test_incremental_detokenizer_with_tekken(tok):
    from aphrodite_tpu.tokenizer_utils import IncrementalDetokenizer
    # multi-byte UTF-8 char split across byte tokens: text only emitted
    # once the glyph completes
    euro = "€".encode()  # 3 bytes
    ids = [b + NS for b in euro]
    d = IncrementalDetokenizer(tok, [261 + NS])
    assert d.update([ids[0]]) == ""
    assert d.update([ids[1]]) == ""
    assert d.update([ids[2]]) == "€"


def test_get_tokenizer_detection(tmp_path):
    write_tekken(tmp_path)
    from aphrodite_tpu.tokenizer_utils import get_tokenizer
    t = get_tokenizer(str(tmp_path))
    assert isinstance(t, TekkenTokenizer)
    t2 = get_tokenizer(str(tmp_path), tokenizer_mode="mistral")
    assert isinstance(t2, TekkenTokenizer)
    assert find_tekken_file(str(tmp_path / "tekken.json"))


def test_tekken_e2e_engine(tmp_path):
    """Engine drive: string prompts tokenize through TekkenTokenizer, run
    the model, and detokenize through the incremental path."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams
    from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

    save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config(vocab_size=512))
    write_tekken(tmp_path)  # checkpoint dir doubles as the tokenizer dir

    llm = LLM(model=str(tmp_path), tokenizer=str(tmp_path),
              tokenizer_mode="mistral", dtype="float32", block_size=16,
              num_kv_blocks=64, max_num_seqs=2, max_model_len=64)
    out = llm.generate(["hello abc"],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 4
    tok = llm.get_tokenizer()
    assert isinstance(tok, TekkenTokenizer)
    # streamed text is a prefix of the direct decode (the incremental
    # detokenizer holds back bytes while the random model's output ends
    # mid-glyph / in U+FFFD)
    assert tok.decode(out.outputs[0].token_ids).startswith(
        out.outputs[0].text)
    # and the prompt round-tripped through tekken encode: 3 tokens + bos
    assert out.prompt_token_ids[0] == tok.bos_token_id
    assert tok.decode(out.prompt_token_ids) == "hello abc"
