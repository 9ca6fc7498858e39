#!/usr/bin/env python
"""Regenerate dialect/collation_ja.py's JA_WEIGHTS dict.

Parses the reference's full utf8mb4_ja_0900_as_cs weight table
(/root/reference/sql/encodings/generate/utf8mb4_ja_0900_as_cs.go) and
keeps only the code points the test corpus exercises. Run after widening
the corpus character set below; paste the printed dict into
dialect/collation_ja.py (or redirect and splice).
"""

from __future__ import annotations

import re
import pathlib

CHARS = set(chr(c) for c in range(0x20, 0x7F))           # ASCII printable
CHARS |= set(chr(c) for c in range(0x3041, 0x3097))      # hiragana
CHARS |= set(chr(c) for c in range(0x30A1, 0x30FB))      # katakana
CHARS |= set("ーゝゞ・、。「」『』　")                      # CJK punctuation
CHARS |= set("日本語東京大学生月火水木金土曜愛犬猫山川田中村上下左右白黒赤青"
             "空海花鳥風雨雪国人子女男時間年世界文字読書駅車電話新古高低長短")

SRC = pathlib.Path(
    "/root/reference/sql/encodings/generate/utf8mb4_ja_0900_as_cs.go")


def main() -> None:
    weights: dict[str, int] = {}
    for m in re.finditer(r"^\t(\d+):\s+(\d+),$",
                         SRC.read_text(), re.M):
        ch = chr(int(m.group(1)))
        if ch in CHARS:
            weights[ch] = int(m.group(2))
    missing = sorted(c for c in CHARS if c not in weights)
    assert not missing, [hex(ord(c)) for c in missing]
    for ch, w in sorted(weights.items(), key=lambda kv: ord(kv[0])):
        c = ch.replace("\\", "\\\\").replace('"', '\\"')
        print(f'    "{c}": {w},')


if __name__ == "__main__":
    main()
