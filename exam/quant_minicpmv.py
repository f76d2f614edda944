#!/usr/bin/env python
"""MiniCPM-V-2_6 pipeline wrapper (reference parity: exam/quant_minicpmv.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from exam.quant_vlm import main, parser_gen

if __name__ == "__main__":
    main(parser_gen(model_default="MiniCPM-V-2_6").parse_args())
