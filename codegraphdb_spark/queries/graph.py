"""Code-property-graph query catalog (reference C1–C10, E1–E3 reproduced
over the engine's nodes/edges DataFrames built from the embedded mini-repo
fixture). Registered incrementally as the graph engine lands."""

from __future__ import annotations
