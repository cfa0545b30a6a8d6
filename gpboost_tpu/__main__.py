"""python -m gpboost_tpu — the CLI entry point (reference:
src/LightGBM/main.cpp)."""
from .cli import main

main()
