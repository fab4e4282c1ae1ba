"""Parity tests for the native C++ byte-level BPE tokenizer against the HF
`tokenizers` library, on a BPE tokenizer trained locally (no hub access)."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from moondream_tpu import native_bpe  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native_bpe.available(), reason="native BPE library unavailable"
)

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Moondream is a small vision language model, isn't it?",
    "import numpy as np\nx = np.zeros((378, 378, 3))",
    "Prices rose 12.5% in 2024 -- unbelievable!",
    "he said: \"don't you'll we've they're I'm it's\"",
    "multi   spaces\tand\nnewlines  everywhere   ",
    "punctuation!!! ??? ;;; ((())) [brackets] {braces}",
    "emails like a.b@c-d.org and urls http://x.y/z?a=1&b=2",
] * 50


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=True
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600, initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tok.save(path)
    return tok, path


@pytest.fixture(scope="module")
def native(trained):
    _, path = trained
    return native_bpe.NativeBPETokenizer.from_file(path)


TEXTS = [
    "The quick brown fox",
    " leading space",
    "trailing space ",
    "don't we'll they've I'm you're it's he'd",
    "numbers 123 45.67 1,000,000 2024",
    "mixed: abc123def!!! (parens) [brackets]",
    "multi   spaces\tand\ttabs",
    "newlines\nin\n\nbetween",
    "   ",
    "",
    "a",
    "UPPER lower MiXeD",
    "symbols @#$%^&*-_=+ and / \\ | ~ `",
    "quote \"inside\" 'single'",
    "hyphen-ated co-operate re--do",
    "dot.dot.dot ... ellipsis…",
    "unicode café naïve über señor",
    "greek αβγδ and cyrillic привет",
]


@pytest.mark.parametrize("text", TEXTS)
def test_encode_matches_hf(trained, native, text):
    hf, _ = trained
    assert native.encode(text) == hf.encode(text).ids, repr(text)


@pytest.mark.parametrize("text", TEXTS)
def test_decode_roundtrip(native, text):
    assert native.decode(native.encode(text)) == text, repr(text)


def test_decode_matches_hf(trained, native):
    hf, _ = trained
    ids = hf.encode("The quick brown fox, isn't it? 123").ids
    assert native.decode(ids) == hf.decode(ids)


def test_corpus_sweep(trained, native):
    hf, _ = trained
    mismatches = []
    for text in CORPUS[:8]:
        if native.encode(text) != hf.encode(text).ids:
            mismatches.append(text)
    assert not mismatches, mismatches


def test_rejects_non_bpe(tmp_path):
    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        json.dump({"model": {"type": "WordPiece"}}, f)
    with pytest.raises(ValueError):
        native_bpe.NativeBPETokenizer.from_file(path)
