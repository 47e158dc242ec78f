"""Regenerate tests/fixtures/espeak_en_us_ipa.tsv on a machine WITH espeak-ng.

The image this repo builds in has no espeak binary and no network egress, so
the committed fixture rows follow espeak-ng 1.50 conventions but are not
byte-verified against a real binary. Run this anywhere espeak-ng is installed
to pin them exactly:

    python scripts/make_espeak_fixtures.py --out tests/fixtures/espeak_en_us_ipa.tsv

It phonemizes each existing fixture CHUNK (column 1) through the same
subprocess invocation `EspeakBackend._phonemize_chunk` uses
(`espeak-ng -q --ipa -v en-us <chunk>`, etts/text/tokenizer.py:65-72) and
rewrites column 2 with the raw stdout (newlines escaped as \\n). The parsing
tests in tests/test_espeak_contract.py consume the file either way.

Reference contract: `/root/reference/TransformerTTS/preprocessing/text/
tokenizer.py:30-50` (phonemizer package, espeak backend, IPA output).
"""
import argparse
import pathlib
import shutil
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/espeak_en_us_ipa.tsv")
    p.add_argument("--language", default="en-us")
    a = p.parse_args()

    binary = shutil.which("espeak-ng") or shutil.which("espeak")
    if binary is None:
        sys.exit("espeak-ng not installed — run this on a machine that has it")

    path = pathlib.Path(a.out)
    lines = path.read_text(encoding="utf-8").splitlines()
    out_lines = []
    for line in lines:
        if not line or line.startswith("#"):
            out_lines.append(line)
            continue
        chunk = line.split("\t", 1)[0]
        raw = subprocess.run(
            [binary, "-q", "--ipa", "-v", a.language, chunk],
            capture_output=True, text=True, check=True).stdout.strip()
        out_lines.append(f"{chunk}\t" + raw.replace("\n", "\\n"))
    path.write_text("\n".join(out_lines) + "\n", encoding="utf-8")
    print(f"rewrote {path} with byte-exact {binary} output")


if __name__ == "__main__":
    main()
