# Developer gates.  `make check` is the pre-commit gate (lint + cheap tests);
# `make test` is the full CPU suite (warm cache ~15-30 min, cold ~1 h).
# CI runs the same lint + subset on GitHub (.github/workflows/ci.yaml).

PY ?= python

.PHONY: check lint test subset

check: lint subset

lint:
	@if $(PY) -c "import ruff" 2>/dev/null || command -v ruff >/dev/null 2>&1; then \
		ruff check skillful_nowcasting_tpu tests train scripts; \
	else \
		echo "ruff not installed in this image - running stdlib fallback (syntax only)"; \
		$(PY) -m compileall -q skillful_nowcasting_tpu tests train scripts bench.py __graft_entry__.py; \
	fi

subset:
	$(PY) -m pytest tests/test_shapes.py tests/test_losses.py \
		tests/test_metrics.py tests/test_ops_parity.py -q

test:
	$(PY) -m pytest tests/ -q
