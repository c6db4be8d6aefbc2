# Convenience targets (see CLAUDE.md for environment notes)

test:
	python -m pytest tests/ -q

test-full:
	NLE_RUN_FULL_GOLDEN=1 python -m pytest tests/ -q

golden-cpu:
	python tools/golden_sweep.py --platform=cpu

golden-tpu:
	python tools/golden_sweep.py --platform=axon

bench:
	python bench.py

# Per-round two-mode artifact (single + stream, each line mode-labeled).
bench-modes:
	python tools/bench_both_modes.py

install:
	pip install -e . --no-deps --no-build-isolation

bench-capacity:
	python tools/bench_capacity.py

bench-batch:
	python tools/bench_batch.py

bench-capacity-factored:
	python tools/bench_capacity.py --factored --mp=64

serve:
	python -m nle_tpu.serving.http

serve-selftest:
	python -m nle_tpu.serving.http --selftest --platform=cpu

# Real-chip per-round checks (run AFTER `make bench` so the compile cache is
# warm; record the JSON lines to *_CHECK.json — see .claude/skills/verify).
tpu-check-sharded:
	python tools/check_tpu_sharded.py

tpu-check-serving:
	python tools/check_tpu_serving.py

# Sustained mixed-traffic soak against one server (CPU, ~60 s).
soak-serving:
	python tools/soak_serving.py
