"""SigLIP sentencepiece-unigram tokenizer tests.

The real `sentencepiece` wheel is absent here, so parity is established two
ways:
  * the Viterbi segmentation core is oracled against the HF-`tokenizers`
    Rust `Unigram` model — the exact model `convert_slow_tokenizer.
    SpmConverter` builds from a sentencepiece proto (model_type==1 branch),
    which ships its own sp-compatible lattice search;
  * the surrounding SigLIP pipeline (lowercase, big_vision canonicalize,
    explicit `▁` prefix, eos/pad-with-`</s>`, max_length 64) is asserted
    against expectations derived line-by-line from HF
    `SiglipTokenizer.tokenize/_tokenize/canonicalize_text`
    (transformers/models/siglip/tokenization_siglip.py:278-330).

The spiece.model fixture is serialized with transformers' bundled
sentencepiece ModelProto, so our minimal wire-format parser is exercised on
a genuine protobuf encoding.
"""
import numpy as np
import pytest

from tunevlseg_tpu.data.tokenizer import SigLIPTokenizer, load_default_tokenizer

# (piece, score, type): 2=UNKNOWN, 3=CONTROL, 1=NORMAL — layout mirrors a
# real spiece.model (specials first, then scored subword pieces)
PIECES = [
    ("<unk>", 0.0, 2),
    ("</s>", 0.0, 3),
    ("▁", -2.5, 1),
    ("▁a", -3.0, 1),
    ("▁the", -2.0, 1),
    ("▁photo", -4.0, 1),
    ("▁of", -2.2, 1),
    ("▁polyp", -5.0, 1),
    ("▁pol", -4.5, 1),
    ("yp", -3.5, 1),
    ("▁p", -3.2, 1),
    ("olyp", -6.0, 1),
    ("o", -4.0, 1),
    ("l", -4.1, 1),
    ("y", -4.2, 1),
    ("p", -4.3, 1),
    ("▁le", -3.4, 1),
    ("sion", -3.6, 1),
    ("s", -3.9, 1),
    ("▁x", -5.5, 1),
]


@pytest.fixture(scope="module")
def spiece_path(tmp_path_factory):
    from transformers.convert_slow_tokenizer import import_protobuf
    pb = import_protobuf()
    m = pb.ModelProto()
    for piece, score, t in PIECES:
        sp = m.pieces.add()
        sp.piece, sp.score, sp.type = piece, score, t
    m.trainer_spec.model_type = 1  # UNIGRAM
    m.trainer_spec.unk_id = 0
    path = tmp_path_factory.mktemp("spm") / "spiece.model"
    path.write_bytes(m.SerializeToString())
    return path


@pytest.fixture(scope="module")
def tok(spiece_path):
    return SigLIPTokenizer(spiece_path)


def test_proto_parsing(tok):
    assert tok.vocab_size == len(PIECES)
    assert tok.unk_token_id == 0
    assert tok.eos_token_id == 1
    assert tok.pad_token_id == 1  # HF Siglip: pad token IS </s>
    for got, exp in zip(tok.pieces, PIECES):
        assert got[0] == exp[0] and got[2] == exp[2]
        assert got[1] == pytest.approx(exp[1])  # f32 score field


def test_viterbi_matches_rust_unigram(tok):
    """Segment ▁-escaped strings with the HF-`tokenizers` Unigram model (the
    fast-tokenizer backend sentencepiece protos convert to) and require
    identical ids from our Viterbi."""
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    rust = Tokenizer(Unigram([(p, s) for p, s, _ in PIECES], unk_id=0))
    cases = [
        "▁the▁photo",
        "▁polyp",                   # whole piece beats pol+yp (score sums)
        "▁pol",
        "▁a▁polyps",                # suffix s
        "▁lesion",
        "▁the▁q",                   # q unknown -> <unk>
        "▁qq▁of",                   # fused unknowns
        "▁p" + "olyp" * 3,
        "▁x▁ypol",
    ]
    for s in cases:
        ours = tok._viterbi(s)
        ref = rust.encode(s).ids
        assert ours == ref, (s, ours, ref)


def test_pipeline_semantics(tok):
    # lowercase + punctuation strip + collapse (canonicalize_text), ▁ prefix,
    # eos appended
    pid = {p: i for i, (p, _, _) in enumerate(tok.pieces)}
    ids = tok.encode("The  PHOTO, of a polyp!")
    exp = [pid["▁the"], pid["▁photo"], pid["▁of"], pid["▁a"], pid["▁polyp"],
           tok.eos_token_id]
    assert ids == exp
    # punctuation-only input: canonicalization strips the '!' but the
    # explicit '▁' prefix survives (exactly what HF's pipeline yields —
    # canonicalize_text never touches the SPIECE_UNDERLINE char)
    assert tok.encode("!!!") == [pid["▁"], tok.eos_token_id]
    # pre-existing ▁ in input is treated as whitespace (HF tokenize())
    assert tok.encode("the▁photo") == tok.encode("the photo")


def test_batch_contract(tok):
    out = tok(["a polyp", "the photo of a lesion"])
    assert out["input_ids"].shape == (2, 64)  # SigLIP model_max_length
    assert out["input_ids"].dtype == np.int32
    # padding with </s> (= pad), mask marks real tokens + the first eos
    row = out["input_ids"][0]
    n = int(out["attention_mask"][0].sum())
    assert row[n - 1] == tok.eos_token_id
    assert (row[n:] == tok.pad_token_id).all()
    # truncation keeps eos in the last slot
    tiny = tok("polyp " * 200, max_length=8)
    assert tiny["input_ids"].shape == (1, 8)
    assert tiny["input_ids"][0, -1] == tok.eos_token_id
    assert tiny["attention_mask"][0].all()


def test_decode_round_trip(tok):
    ids = tok.encode("the photo of a polyp")
    assert tok.decode(ids) == "the photo of a polyp"


def test_family_loader(spiece_path):
    t = load_default_tokenizer(spiece_path, family="siglip")
    assert isinstance(t, SigLIPTokenizer)
    with pytest.raises(FileNotFoundError):
        load_default_tokenizer(None, family="siglip")
