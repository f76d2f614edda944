#!/usr/bin/env python
"""InternVL2-8B pipeline wrapper (reference parity: exam/quant_internvl.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from exam.quant_vlm import main, parser_gen

if __name__ == "__main__":
    main(parser_gen(model_default="InternVL2-8B").parse_args())
