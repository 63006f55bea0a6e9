"""Golden tests for tweet normalization (SURVEY.md section 4: golden strings
through the normalizeTweet rules), plus behavioural parity against the
reference implementation when it is mounted."""

import os
import sys

import pytest

from socialmedia_textimage_classification_auxlosses_tpu.data.normalize import (
    TweetNormalizer,
    tweet_tokenize,
    replace_html_entities,
    reduce_lengthening,
    demojize_char,
)

NORM = TweetNormalizer()


def test_user_handles_become_user_token():
    assert NORM.normalize("@remy hello") == "@USER hello"
    assert NORM.normalize("hi @a_b2 and @x") == "hi @USER and @USER"


def test_urls_become_httpurl():
    assert NORM.normalize("see https://t.co/xyz now") == "see HTTPURL now"
    assert NORM.normalize("go to www.example.com please") == "go to HTTPURL please"
    # naked domains tokenize as one URL token but are NOT rewritten: the
    # reference only rewrites tokens starting with http/www
    # (text_processing.py:238-239)
    assert NORM.normalize("check example.com ok") == "check example.com ok"


def test_contractions_are_split():
    assert NORM.normalize("I'm can't won't we're ok") == "I 'm can't wo n't we 're ok"
    assert NORM.normalize("cannot stop") == "can not stop"
    assert NORM.normalize("ain't done") == "ain't done"


def test_special_puncts():
    assert NORM.normalize("it’s fine… ok") == "it 's fine ... ok"


def test_emoticons_survive_tokenization():
    toks = tweet_tokenize("This is a cooool #dummysmiley: :-) :-P <3 and some arrows < > -> <--")
    assert toks == [
        "This", "is", "a", "cooool", "#dummysmiley", ":", ":-)", ":-P", "<3",
        "and", "some", "arrows", "<", ">", "->", "<--",
    ]


def test_hang_squeeze():
    # >=4 repeated non-alphanumerics squeeze to 3
    assert tweet_tokenize("wow!!!!!!!") == ["wow", "!", "!", "!"]


def test_html_entities():
    assert replace_html_entities("Price: &pound;100") == "Price: \xa3100"
    assert replace_html_entities("a &amp; b") == "a & b"
    assert replace_html_entities("&#8217;") == "’"


def test_reduce_lengthening():
    assert reduce_lengthening("waaaaayyyy") == "waaayyy"


def test_demojize():
    assert demojize_char("\U0001F602") == ":face_with_tears_of_joy:"
    assert demojize_char("a") == "a"
    assert NORM.normalize("so funny \U0001F602") == "so funny :face_with_tears_of_joy:"


def test_phone_numbers_kept_whole():
    assert tweet_tokenize("call 555-123-4567 now") == ["call", "555-123-4567", "now"]


REFERENCE_PREPROCESSING = "/root/reference/preprocessing"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_PREPROCESSING), reason="reference not mounted"
)
def test_parity_with_reference_normalizer():
    sys.path.insert(0, REFERENCE_PREPROCESSING)
    try:
        from text_processing import Tweet_Preprocessing  # type: ignore

        ref = Tweet_Preprocessing()
        cases = [
            "@remy: This is waaaaayyyy too much for you!!!!!!",
            "RT @user check https://t.co/abc123 and www.foo.org now!!",
            "I'm sooo happy :-) can't wait... #blessed #yolo2020",
            "Price: &pound;100 &amp; more at example.com/page?(x) ok",
            "it’s the weekend… cannot believe it ain't monday",
            "email me at foo.bar+1@example.co.uk or call 555-123-4567",
            "<b>bold</b> claim -> see <-- arrows <3 :-P",
            "100,000 people 3.5/5 stars 12:30 p. m. start",
            # trickier corpus: hashtag underscores/dashes, stacked entities,
            # cased URLs, handles at EOL, nested parens URLs, lengthened
            # punctuation runs, numeric entities, mixed quotes
            "#black_lives_matter #covid-19 response @WHO",
            # (no emoji-producing entities here: this env's reference lacks
            # the emoji package, while ours demojizes built-in)
            "&#8220;quoted&#8221; &gt; &lt; end",
            "HTTPS://EXAMPLE.COM/PATH and http://a.b/c(d(e)f)g end",
            "final mention goes to @last_user",
            "soooo goooood!!!!!!!!!! ........ ?!?!?!",
            "w/ 50% off (terms&conditions apply) - 'quotes' \"here\"",
            "mid-sentence hyphen-ated words re-up o'clock don'ts",
            "1-800-555-0199 is toll-free, +1 555 123 4567 intl",
            "u.s.a. vs U.K. at 3 a. m . sharp",
            ":) :( ;-) :-D =D 8-) >:( <3 </3",
        ]
        # Reference env has no emoji package, so single-char emoji pass
        # through there; every case above is emoji-free.
        for s in cases:
            assert NORM.normalize(s) == ref.normalizeTweet(s), s
    finally:
        sys.path.remove(REFERENCE_PREPROCESSING)
