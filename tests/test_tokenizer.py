"""Tokenizer backend tests (VERDICT r2 #8).

Reference model: ``tests/test_tokenizer.py:9-32`` checks encode/decode against
``AutoTokenizer`` downloaded from the Hub. This environment has no network and
no ``sentencepiece`` wheel, so:

- the HF-tokenizers backend is tested for real — a tiny BPE model is trained
  in-test and parity is asserted against ``transformers.PreTrainedTokenizerFast``
  loaded from the same file (the exact object ``AutoTokenizer`` would return);
- the sentencepiece backend (priority, bos/eos semantics, decode plumbing) is
  tested through a faithful fake ``SentencePieceProcessor`` injected into
  ``sys.modules`` — the library is C++ host code the reference also treats as
  an external dependency (``lit_gpt/tokenizer.py:12``).
"""

import json
import sys
import types

import numpy as np
import pytest

from parrot_tpu.utils.tokenizer import Tokenizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
] * 8


def make_hf_dir(tmp_path, bos="<s>", eos="</s>"):
    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer

    tok = HFTokenizer(BPE(unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(
        vocab_size=256, special_tokens=["<unk>", bos, eos], show_progress=False
    )
    tok.train_from_iterator(CORPUS, trainer)
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"bos_token": bos, "eos_token": {"content": eos}})
    )
    return tmp_path


def test_hf_backend_roundtrip(tmp_path):
    t = Tokenizer(make_hf_dir(tmp_path))
    assert t.backend == "huggingface"
    ids = t.encode("the quick brown fox")
    assert ids.dtype == np.int32 and ids.ndim == 1 and len(ids) > 0
    # decode . encode is identity on in-vocab whitespace-tokenized text
    assert t.decode(ids).split() == ["the", "quick", "brown", "fox"]

    with_bos = t.encode("the quick brown fox", bos=True)
    assert with_bos[0] == t.bos_id and list(with_bos[1:]) == list(ids)
    with_eos = t.encode("the quick brown fox", eos=True)
    assert with_eos[-1] == t.eos_id and list(with_eos[:-1]) == list(ids)
    assert len(t.encode("the quick brown fox", max_length=2)) == 2
    # bos/eos resolved from tokenizer_config.json (str and dict forms)
    assert t.bos_id == t.token_to_id("<s>")
    assert t.eos_id == t.token_to_id("</s>")


def test_hf_backend_parity_with_transformers(tmp_path):
    """Same files, our wrapper vs transformers' fast-tokenizer wrapper."""
    d = make_hf_dir(tmp_path)
    t = Tokenizer(d)
    from transformers import PreTrainedTokenizerFast

    hf = PreTrainedTokenizerFast(
        tokenizer_file=str(d / "tokenizer.json"), bos_token="<s>", eos_token="</s>"
    )
    for text in CORPUS[:4] + ["judge my vow", "zebras jump over jugs"]:
        ours = t.encode(text)
        theirs = hf.encode(text, add_special_tokens=False)
        assert list(ours) == list(theirs)
        assert t.decode(ours) == hf.decode(theirs)
    assert t.bos_id == hf.bos_token_id
    assert t.eos_id == hf.eos_token_id
    assert t.vocab_size == hf.vocab_size


class FakeSentencePieceProcessor:
    """Word-level stand-in with the SentencePieceProcessor API surface the
    wrapper touches: encode/decode/vocab_size/bos_id/eos_id/piece_to_id and
    the sentencepiece convention of -1 for an undefined bos/eos."""

    VOCAB = ["<unk>", "<s>", "</s>"] + sorted({w for s in CORPUS for w in s.split()})

    def __init__(self, model_file=None, bos=1, eos=2):
        self._bos, self._eos = bos, eos

    def encode(self, text):
        lookup = {w: i for i, w in enumerate(self.VOCAB)}
        return [lookup.get(w, 0) for w in text.split()]

    def decode(self, ids):
        return " ".join(self.VOCAB[i] for i in ids if i not in (self._bos, self._eos))

    def vocab_size(self):
        return len(self.VOCAB)

    def bos_id(self):
        return self._bos

    def eos_id(self):
        return self._eos

    def piece_to_id(self, piece):
        return {w: i for i, w in enumerate(self.VOCAB)}.get(piece, 0)


@pytest.fixture
def fake_sentencepiece(monkeypatch):
    mod = types.ModuleType("sentencepiece")
    mod.SentencePieceProcessor = FakeSentencePieceProcessor
    monkeypatch.setitem(sys.modules, "sentencepiece", mod)
    return mod


def test_sentencepiece_takes_priority_over_hf(tmp_path, fake_sentencepiece):
    """tokenizer.model wins when both files exist (lit_gpt/tokenizer.py:9-29)."""
    d = make_hf_dir(tmp_path)
    (d / "tokenizer.model").write_bytes(b"\x00fake-sp-model")
    t = Tokenizer(d)
    assert t.backend == "sentencepiece"
    ids = t.encode("the quick brown fox", bos=True, eos=True)
    assert ids[0] == 1 and ids[-1] == 2
    assert t.decode(ids) == "the quick brown fox"
    assert t.vocab_size == len(FakeSentencePieceProcessor.VOCAB)
    assert t.token_to_id("fox") == FakeSentencePieceProcessor.VOCAB.index("fox")


def test_sentencepiece_undefined_bos_raises(tmp_path, monkeypatch, fake_sentencepiece):
    """sp models without a BOS piece report -1; asking for bos must raise,
    not emit token -1 (matches reference behavior of erroring on bos=None)."""
    monkeypatch.setattr(
        fake_sentencepiece, "SentencePieceProcessor",
        lambda model_file=None: FakeSentencePieceProcessor(bos=-1, eos=-1),
    )
    (tmp_path / "tokenizer.model").write_bytes(b"\x00fake")
    t = Tokenizer(tmp_path)
    assert t.encode("the dog", bos=False).tolist() == t.encode("the dog").tolist()
    with pytest.raises(NotImplementedError):
        t.encode("the dog", bos=True)
    with pytest.raises(NotImplementedError):
        t.encode("the dog", eos=True)


def test_sp_file_without_library_falls_back_to_hf(tmp_path, monkeypatch):
    """tokenizer.model present but sentencepiece not importable: use the HF
    files when they exist instead of failing the load."""
    monkeypatch.setitem(sys.modules, "sentencepiece", None)  # forces ImportError
    d = make_hf_dir(tmp_path)
    (d / "tokenizer.model").write_bytes(b"\x00fake")
    t = Tokenizer(d)
    assert t.backend == "huggingface"
    assert t.decode(t.encode("judge my vow")).split() == ["judge", "my", "vow"]


def test_sp_file_without_library_or_hf_raises(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "sentencepiece", None)
    (tmp_path / "tokenizer.model").write_bytes(b"\x00fake")
    with pytest.raises(ImportError, match="sentencepiece"):
        Tokenizer(tmp_path)


def test_no_tokenizer_files_raises(tmp_path):
    with pytest.raises(NotImplementedError, match="No tokenizer"):
        Tokenizer(tmp_path)


class FakeSubwordSPProcessor:
    """sp-style subword fake: pieces carry the '▁' word-boundary marker and
    merge across token boundaries when decoded — the property that forces
    chat streaming to re-decode the whole prefix (chat/base.py:98-117)."""

    PIECES = ["<unk>", "<s>", "</s>", "▁the", "▁qu", "ick", "▁br", "own",
              "▁fox", "▁jum", "ps"]

    def __init__(self, model_file=None):
        pass

    def encode(self, text):
        # greedy longest-piece tokenization over the marked text
        marked = "▁" + text.replace(" ", "▁")
        ids, i = [], 0
        while i < len(marked):
            for j in range(len(marked), i, -1):
                if marked[i:j] in self.PIECES:
                    ids.append(self.PIECES.index(marked[i:j]))
                    i = j
                    break
            else:
                ids.append(0)
                i += 1
        return ids

    def decode(self, ids):
        return "".join(
            self.PIECES[i] for i in ids if i not in (1, 2)
        ).replace("▁", " ").lstrip()

    def vocab_size(self):
        return len(self.PIECES)

    def bos_id(self):
        return 1

    def eos_id(self):
        return 2

    def piece_to_id(self, piece):
        return self.PIECES.index(piece) if piece in self.PIECES else 0


def test_sentencepiece_chat_incremental_decode(tmp_path, monkeypatch):
    """The chat streaming loop (prefix-diff re-decode, scripts/chat.py:80-105)
    must reconstruct the exact final text through the sp backend even when
    pieces merge across token boundaries mid-word."""
    mod = types.ModuleType("sentencepiece")
    mod.SentencePieceProcessor = FakeSubwordSPProcessor
    monkeypatch.setitem(sys.modules, "sentencepiece", mod)
    (tmp_path / "tokenizer.model").write_bytes(b"\x00fake")
    t = Tokenizer(tmp_path)
    assert t.backend == "sentencepiece"

    text = "the quick brown fox jumps"
    ids = t.encode(text).tolist()
    assert len(ids) > 5  # genuinely subword: pieces split mid-word

    # the chat.py streaming loop, verbatim semantics
    produced, printed = [], ""
    emitted_chunks = []
    for tok in ids:
        produced.append(int(tok))
        cur = t.decode(produced)
        emitted_chunks.append(cur[len(printed):])
        printed = cur
    assert printed == text
    assert "".join(emitted_chunks) == text
    # mid-word pieces arrive without spurious separators ('ick' after '▁qu')
    assert "ick" in emitted_chunks and " qu" in "".join(emitted_chunks)
