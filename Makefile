# Convenience targets (the reference drives everything through cargo aliases,
# .cargo/config.toml:1-28)
# Tooling pins (pytest-xdist >= 3.2 for --dist worksteal): requirements-dev.txt
.PHONY: test test-all bench lint snarkstar tensorstar trivial

test:
	python -m pytest tests/ -q -n 4 --dist worksteal

test-all:
	MIRA_RUN_SLOW=1 python -m pytest tests/ -q -n 4 --dist worksteal

bench:
	python bench.py

lint:
	ruff check mira_tpu tests bench.py || true

trivial:
	python -m mira_tpu.workloads.trivial --steps 2 --k 17

snarkstar:
	python -m mira_tpu.workloads.snarkstar --steps 1 --batch-size 1 --real-proofs

tensorstar:
	python -m mira_tpu.workloads.tensorstar --repeat-count 1 --matrix-dim 128
