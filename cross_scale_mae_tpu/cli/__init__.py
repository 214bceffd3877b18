"""CLI entry points: pretrain / finetune / linprobe / evalviz — the same
3+1 surface as the reference (main_pretrain.py, main_finetune.py,
main_linprobe.py, util/viz.py)."""
