#!/usr/bin/env python
"""GLM-4V-9B pipeline wrapper (reference parity: exam/quant_glm4v.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from exam.quant_vlm import main, parser_gen

if __name__ == "__main__":
    main(parser_gen(model_default="GLM-4V-9B").parse_args())
