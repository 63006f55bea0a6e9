"""Generate the vendored emoji-0.6.0 demojize table (single-codepoint entries).

Why this exists
---------------
The reference normalizer demojizes single-character tokens through
``emoji.demojize`` from ``emoji==0.6.0`` (reference
``preprocessing/text_processing.py:186-194,243``).  That package is not
installable in this environment (no egress, not baked in), so we vendor the
part of its table that the reference pipeline can ever reach: the tokenizer
splits every non-word character into its own 1-char token and only
``len(token) == 1`` tokens are demojized, so **only bare single-codepoint
entries matter** — ZWJ sequences, flags, and skin-toned compositions can
never appear as a 1-char token.

Ground truth used (all offline, in-image):

* ``rich._emoji_codes.EMOJI`` — rich's emoji table was generated from the
  emoji package's data of the same era.  Forensics supporting this:
  (a) per-character insertion order is CLDR-name-first, github-alias-second
  (``double_exclamation_mark`` before ``bangbang``; ``thumbs_up`` before
  ``+1``/``thumbsup``), matching a dump of ``EMOJI_UNICODE`` followed by
  ``EMOJI_ALIAS_UNICODE``; (b) it has the period-correct CLDR-36/37 name
  ``pouting_face`` for U+1F621 (renamed "enraged face" only in CLDR 44,
  long after emoji 0.6.0); (c) values carry U+FE0F only *inside* ZWJ
  sequences and never as a trailing variation selector on standalone
  emoji — exactly how emoji 0.6.0 stored standalone emoji as bare
  codepoints.  Consequence: ``emoji.demojize("❤")`` (bare heavy black
  heart, which is what every ``<3``-adjacent 1-char token looks like after
  the tokenizer splits ``❤️``) really does return
  ``:red_heart:`` in 0.6.0, while the stray ``️`` token passes
  through unchanged.
* A hand-restored fix table for names where emoji 0.6.0 preserved CLDR
  capitalization/punctuation that rich lowercased or stripped
  (``:Santa_Claus:``, ``:OK_button:``, ``:Japanese_“service_charge”_button:``,
  ``:T-Rex:``, the zodiac, …).

Residual risk, stated honestly: rich's snapshot may include a handful of
emoji added after 0.6.0 (we would demojize where 0.6.0 passes through) and
any CLDR rename between the snapshots would carry the newer name.  The
live adjudication test ``tests/test_normalize.py::test_demojize_parity_live``
settles every entry the moment ``emoji==0.6.0`` is installable.

Run:  python tools/gen_emoji06_table.py   (rewrites
      socialmedia_textimage_classification_auxlosses_tpu/data/_emoji06_table.py)
"""

from __future__ import annotations

import os
import sys

# Names where emoji 0.6.0 kept CLDR capitalization / curly punctuation that
# rich's lowercased table loses.  Keyed by codepoint; value is the exact
# emoji-0.6.0 name (without the wrapping colons).
NAME_FIXES = {
    0x1F385: "Santa_Claus",
    0x1F936: "Mrs._Claus",
    0x1F384: "Christmas_tree",
    0x1F996: "T-Rex",
    0x1F5FB: "Mount_Fuji",
    0x1F5FC: "Tokyo_tower",
    0x1F5FD: "Statue_of_Liberty",
    0x1F5FE: "map_of_Japan",
    0x24C2: "circled_M",
    # zodiac
    0x2648: "Aries",
    0x2649: "Taurus",
    0x264A: "Gemini",
    0x264B: "Cancer",
    0x264C: "Leo",
    0x264D: "Virgo",
    0x264E: "Libra",
    0x264F: "Scorpio",
    0x2650: "Sagittarius",
    0x2651: "Capricorn",
    0x2652: "Aquarius",
    0x2653: "Pisces",
    0x26CE: "Ophiuchus",
    # buttons / signs
    0x1F170: "A_button_(blood_type)",
    0x1F171: "B_button_(blood_type)",
    0x1F18E: "AB_button_(blood_type)",
    0x1F17E: "O_button_(blood_type)",
    0x1F17F: "P_button",
    0x1F191: "CL_button",
    0x1F192: "COOL_button",
    0x1F193: "FREE_button",
    0x1F194: "ID_button",
    0x1F195: "NEW_button",
    0x1F196: "NG_button",
    0x1F197: "OK_button",
    0x1F198: "SOS_button",
    0x1F199: "UP!_button",
    0x1F19A: "VS_button",
    0x1F519: "BACK_arrow",
    0x1F51A: "END_arrow",
    0x1F51B: "ON!_arrow",
    0x1F51C: "SOON_arrow",
    0x1F51D: "TOP_arrow",
    0x1F3E7: "ATM_sign",
    0x1F472: "man_with_Chinese_cap",
    # Japanese ideograph buttons (CLDR curly quotes)
    0x1F201: "Japanese_“here”_button",
    0x1F202: "Japanese_“service_charge”_button",
    0x1F21A: "Japanese_“free_of_charge”_button",
    0x1F22F: "Japanese_“reserved”_button",
    0x1F232: "Japanese_“prohibited”_button",
    0x1F233: "Japanese_“vacancy”_button",
    0x1F234: "Japanese_“passing_grade”_button",
    0x1F235: "Japanese_“no_vacancy”_button",
    0x1F236: "Japanese_“not_free_of_charge”_button",
    0x1F237: "Japanese_“monthly_amount”_button",
    0x1F238: "Japanese_“application”_button",
    0x1F239: "Japanese_“discount”_button",
    0x1F23A: "Japanese_“open_for_business”_button",
    0x1F250: "Japanese_“bargain”_button",
    0x1F251: "Japanese_“acceptable”_button",
    0x3297: "Japanese_“congratulations”_button",
    0x3299: "Japanese_“secret”_button",
    0x1F38E: "Japanese_dolls",
    0x1F3E3: "Japanese_post_office",
    0x1F3EF: "Japanese_castle",
    0x1F530: "Japanese_symbol_for_beginner",
}

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "socialmedia_textimage_classification_auxlosses_tpu",
    "data",
    "_emoji06_table.py",
)


def build_table():
    from rich._emoji_codes import EMOJI  # generation-time only dependency

    first_name = {}
    for name, seq in EMOJI.items():
        if len(seq) == 1 and seq not in first_name:
            # dict insertion order: CLDR name precedes github aliases
            first_name[seq] = name
    table = {ord(c): NAME_FIXES.get(ord(c), n) for c, n in first_name.items()}
    return dict(sorted(table.items()))


def main():
    table = build_table()
    lines = [
        '"""Vendored emoji-0.6.0 demojize table (GENERATED — do not edit).',
        "",
        "Regenerate with  python tools/gen_emoji06_table.py  (provenance and",
        "methodology documented there).  Maps bare codepoint -> emoji-0.6.0",
        'CLDR-style name (without colons), e.g. 0x2764 -> "red_heart".',
        '"""',
        "",
        "EMOJI06_NAMES = {",
    ]
    for cp, name in table.items():
        lines.append(f"    0x{cp:05X}: {name!r},")
    lines.append("}")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {len(table)} single-codepoint entries")
    for cp in list(NAME_FIXES) :
        if cp not in table:
            print(f"  WARNING: fix for 0x{cp:X} had no rich entry", file=sys.stderr)


if __name__ == "__main__":
    main()
