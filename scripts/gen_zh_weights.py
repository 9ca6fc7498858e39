#!/usr/bin/env python
"""Regenerate dialect/collation_zh.py's ZH_WEIGHTS dict.

Parses the reference's full utf8mb4_zh_0900_as_cs weight table
(/root/reference/sql/encodings/generate/utf8mb4_zh_0900_as_cs.go) and
keeps only the code points the test corpus exercises (ASCII printable,
CJK punctuation, ~110 common hanzi). Same pattern as gen_ja_weights.py —
run after widening CHARS below and splice the printed dict into
dialect/collation_zh.py.
"""

from __future__ import annotations

import pathlib
import re

CHARS = set(chr(c) for c in range(0x20, 0x7F))           # ASCII printable
CHARS |= set("中国人大小山水火土木金日月天地上下左右东南西北京都市长江河湖海"
             "花鸟鱼虫马牛羊猫狗学生老师书文字语言时间年春夏秋冬爱好红黄蓝绿"
             "白黑你我他她好")
CHARS |= set("，。！？、；：「」（）　")                      # CJK punctuation

SRC = pathlib.Path(
    "/root/reference/sql/encodings/generate/utf8mb4_zh_0900_as_cs.go")


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
