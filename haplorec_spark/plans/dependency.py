"""Make-like dependency DAG for pipeline stages (D1/D2 in SURVEY.md §2.10).

Reproduces the orchestration semantics of
/root/reference/src/groovy/haplorec/util/dependency/Dependency.groovy:74-128:
post-order build of a target's dependencies with a memoized ``built`` set,
cycle detection, and before/after/fail hooks per target.

In Spark the heavy lifting (execution ordering of transformations) is
Catalyst's lazy DAG; this thin orchestrator exists for the *materialization*
policy — each stage rule produces a DataFrame, and a target is "built" when
its rule has run (and, if a sink is attached, its table written). It also
carries the reference's input-override behavior: a seeded target is
considered built from input and its rule (and its dependencies) skipped
(Pipeline.groovy:671-685).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field


class DependencyCycleError(Exception):
    pass


@dataclass
class Dependency:
    """A build target: ``rule`` runs after all ``depends_on`` targets."""

    target: str
    rule: Callable[[], object] | None = None
    depends_on: list[str] = field(default_factory=list)


class DependencyGraph:
    def __init__(self) -> None:
        self._nodes: dict[str, Dependency] = {}
        self.before_build: Callable[[str], None] | None = None
        self.after_build: Callable[[str], None] | None = None
        self.on_fail: Callable[[str, Exception], None] | None = None

    def add(
        self,
        target: str,
        rule: Callable[[], object] | None = None,
        depends_on: Sequence[str] = (),
    ) -> Dependency:
        dep = Dependency(target, rule, list(depends_on))
        self._nodes[target] = dep
        return dep

    def __contains__(self, target: str) -> bool:
        return target in self._nodes

    def dependants(self, target: str) -> list[str]:
        return [
            d.target for d in self._nodes.values() if target in d.depends_on
        ]

    def leaf_dependants(self, target: str) -> list[str]:
        """Targets nothing depends on, reachable downstream of ``target``
        (Dependency.groovy:196-201) — used to build a whole pipeline from
        its input table."""
        out: list[str] = []
        seen: set[str] = set()

        def walk(t: str) -> None:
            if t in seen:
                return
            seen.add(t)
            ds = self.dependants(t)
            if not ds:
                out.append(t)
            for d in ds:
                walk(d)

        walk(target)
        return out

    def build(self, target: str, built: set[str] | None = None) -> set[str]:
        """Build ``target`` and everything it depends on, post-order.

        ``built`` carries memoized completed targets across calls (pass the
        same set to build several targets incrementally); seeded targets
        can be pre-inserted to skip their rules and sub-trees.
        """
        if built is None:
            built = set()
        in_progress: set[str] = set()

        def go(t: str) -> None:
            if t in built:
                return
            if t in in_progress:
                raise DependencyCycleError(
                    f"dependency cycle detected at {t!r}"
                )
            if t not in self._nodes:
                raise KeyError(f"unknown build target {t!r}")
            in_progress.add(t)
            node = self._nodes[t]
            for d in node.depends_on:
                go(d)
            if self.before_build:
                self.before_build(t)
            try:
                if node.rule is not None:
                    node.rule()
            except Exception as e:
                if self.on_fail:
                    self.on_fail(t, e)
                raise
            built.add(t)
            in_progress.discard(t)
            if self.after_build:
                self.after_build(t)

        go(target)
        return built

    def build_all(self, targets: Sequence[str]) -> set[str]:
        built: set[str] = set()
        for t in targets:
            self.build(t, built)
        return built
