"""WordPiece tokenizer exact-id parity vs HF's Rust BertTokenizerFast.

The BiomedCLIP path replaces `AutoTokenizer.from_pretrained(BiomedBERT)`
(reference zsseg_biomedclip.yaml); until now our WordPieceTokenizer was
only self-tested. BertTokenizerFast builds from a bare vocab.txt with no
network, giving a true independent oracle (basic-tokenizer splitting,
accent stripping, greedy longest-match, [UNK] fallbacks, special tokens).
"""
import numpy as np
import pytest

from tunevlseg_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "photo", "of", "a", "poly", "##p", "##ps", "lesion", "##s",
    "x", "-", "ray", "##ray", "chest", "in", "left", "lobe",
    "benign", "malignant", "##ant", "ultra", "##sound", "e", "##e",
    ".", ",", "(", ")", "2", "##2", "cm", "##cm",
]

CASES = [
    "the photo of a polyp",
    "The PHOTO, of a polyp!",            # case + punct-split + unknown '!'
    "x-ray of the chest",                # punctuation splitting mid-word
    "benign lesions in the left lobe.",
    "ultrasound  (2 cm)",                # double space + parens + digits
    "café lesion",                  # accent strip: café -> cafe (-> UNK)
    "肝臓 lesion 🏥",               # CJK chars split per-char (-> UNKs) + emoji
    "benign &amp; malignant",       # html entity must NOT be unescaped (BERT)
    "caf\u00e9 vs cafe\u0301",      # composed + decomposed accents (NFD strip)
    "polyp" * 30,                        # >100 chars -> single [UNK]
    "",                                  # empty
    "\tthe\nphoto ",                     # whitespace forms
    "polyps",                            # suffix continuation
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    from transformers import BertTokenizerFast

    path = tmp_path_factory.mktemp("wp") / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n")
    ours = WordPieceTokenizer(path)
    hf = BertTokenizerFast(vocab_file=str(path), do_lower_case=True)
    return ours, hf


def test_exact_id_parity(pair):
    ours, hf = pair
    for text in CASES:
        got = ours.encode(text)
        ref = hf(text)["input_ids"]
        assert got == ref, (text, got, ref)


def test_batch_contract_matches_hf_padding(pair):
    ours, hf = pair
    texts = ["the photo of a polyp", "x-ray"]
    got = ours(texts, max_length=12)
    ref = hf(texts, padding="max_length", max_length=12,
             truncation=True, return_tensors="np")
    np.testing.assert_array_equal(got["input_ids"],
                                  ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(got["attention_mask"],
                                  ref["attention_mask"].astype(np.int32))


def test_truncation_keeps_sep(pair):
    ours, hf = pair
    text = "the photo of a polyp in the left lobe of the chest"
    got = ours([text], max_length=6)["input_ids"][0]
    ref = hf(text, truncation=True, max_length=6)["input_ids"]
    assert got[0] == ours.cls_token_id and got[-1] == ours.sep_token_id
    np.testing.assert_array_equal(got, np.asarray(ref, np.int32))
