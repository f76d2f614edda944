#!/usr/bin/env python
"""Qwen-VL-Chat pipeline wrapper (reference parity: exam/quant_qwenvl.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from exam.quant_vlm import main, parser_gen

if __name__ == "__main__":
    main(parser_gen(model_default="Qwen-VL-Chat").parse_args())
