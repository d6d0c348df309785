"""CLIP BPE tokenizer parity vs the reference's EXECUTED SimpleTokenizer.

The reference vendors the standard CLIP vocab data file
(third_party/ViewCrafter/lvdm/models/samplers/clip/clip/
bpe_simple_vocab_16e6.txt.gz) alongside its own SimpleTokenizer; running
both implementations over that vocab pins our BPE (merges, byte encoder,
whitespace/lowercase cleanup) and the precomputed _PROMPT_CACHE ids the
vocab-free runtime path relies on."""

import os

import numpy as np
import pytest

VOCAB = (
    "/root/reference/third_party/ViewCrafter/lvdm/models/samplers/clip/clip/"
    "bpe_simple_vocab_16e6.txt.gz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOCAB), reason="reference BPE vocab not available"
)

PROMPTS = [
    "",
    "Rotating view of a scene",
    "a photo of a cat",
    "Hello, WORLD!!  weird   spacing\tand caps",
    "numbers 12345 and symbols #@%",
]


def _ref_tokenizer():
    # load simple_tokenizer.py directly: the clip package __init__ pulls in
    # torchvision, which is not in this image
    import importlib.util
    import sys
    import types

    if "ftfy" not in sys.modules:
        # ftfy is not in this image; fix_text is identity on the ASCII
        # prompts used here (it only repairs mojibake/odd unicode)
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub

    path = os.path.join(os.path.dirname(VOCAB), "simple_tokenizer.py")
    spec = importlib.util.spec_from_file_location("ref_simple_tokenizer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer(VOCAB)


def test_bpe_encode_matches_reference():
    from guidedvd3dgs_tpu.diffusion.tokenizer import SimpleTokenizer

    ref = _ref_tokenizer()
    ours = SimpleTokenizer(VOCAB)
    for p in PROMPTS:
        assert ours.encode(p) == ref.encode(p), p


def test_prompt_cache_ids_match_reference():
    from guidedvd3dgs_tpu.diffusion.tokenizer import _PROMPT_CACHE

    ref = _ref_tokenizer()
    for text, ids in _PROMPT_CACHE.items():
        assert list(ids) == ref.encode(text), text


def test_tokenize_framing_matches_reference_clip():
    """Full [SOT] + bpe + [EOT] zero-padded framing vs the reference clip.py
    tokenize (:185-216) conventions."""
    from guidedvd3dgs_tpu.diffusion.tokenizer import SOT, EOT, SimpleTokenizer, tokenize

    ref = _ref_tokenizer()
    ours = SimpleTokenizer(VOCAB)
    assert SOT == ref.encoder["<|startoftext|>"]
    assert EOT == ref.encoder["<|endoftext|>"]
    toks = tokenize(PROMPTS, tokenizer=ours)
    assert toks.shape == (len(PROMPTS), 77)
    for i, p in enumerate(PROMPTS):
        ids = [SOT] + ref.encode(p) + [EOT]
        np.testing.assert_array_equal(toks[i, : len(ids)], ids)
        assert toks[i, len(ids):].sum() == 0
