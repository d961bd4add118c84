"""A4 deep (type-propagated) resolution goldens on the instance-binding
fixture (mini_repo.DEEP_V1): ctor bindings for locals and self-fields,
annotation bindings, inherited methods reached through bindings, and the
documented dynamic-inference gaps (untyped parameters, non-ctor values)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.extract.ast_extract import _extract_one
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def deep_graph(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(
        files_from_pairs(spark, mini_repo.DEEP_V1), "v1"
    )
    return nodes.cache(), edges.cache()


def test_assign_facts_emitted():
    facts = _extract_one("zoo/app.py", dict(mini_repo.DEEP_V1)["zoo/app.py"])
    assigns = {
        (f["full_name"], f["dst"]) for f in facts if f["fact"] == "assign"
    }
    assert assigns == {
        ("zoo.app.run::pet", "Animal"),
        ("zoo.app.adopt::pup", "Puppy"),
        ("zoo.app.Keeper.coach", "Trainer"),
        ("zoo.app.Keeper.buddy", "Animal"),
        # factory call: binds through make_animal's return annotation
        ("zoo.app.visit::a", "make_animal"),
        # unannotated factory: binds through breed's INFERRED return type
        ("zoo.app.rehome::p", "breed"),
        # chained factory (r5): binds through breed_chain -> breed -> Puppy
        ("zoo.app.foster::q", "breed_chain"),
        # unannotated parameters emit POISON bindings (type None): they
        # shadow, never resolve (ADVICE r2)
        ("zoo.app.Keeper.__init__::self", None),
        ("zoo.app.Keeper.tend::self", None),
        ("zoo.app.Puppy.lick::self", None),
        ("zoo.app.Shelter.setup::self", None),
        ("zoo.app.Shelter.resident::self", None),
        ("zoo.app.Shelter.checkup::self", None),
        # getter-chained second-level binding (round 4): s's ctor binding
        # + resident's self-field return resolve v to Trainer
        ("zoo.app.consult::s", "Shelter"),
        ("zoo.app.consult::v", "s.resident"),
        # field ctor binding OUTSIDE __init__
        ("zoo.app.Shelter.vet", "Trainer"),
        # ALIAS bindings (bare Name / Attribute RHS)
        ("zoo.app.deliver::Beast", "Animal"),
        ("zoo.app.coach_session::coach", "Trainer"),
        ("zoo.app.stock::factory", "make_animal"),
        ("zoo.app.enroll::trainer_cls", "za.Trainer"),
        # second-level chain: pet binds through t's binding + recruit's
        # annotated return (deepen_bindings)
        ("zoo.app.chain::t", "Trainer"),
        ("zoo.app.chain::pet", "t.recruit"),
    }
    alias_keys = {
        f["full_name"]
        for f in facts
        if f["fact"] == "assign" and f["association_type"] == "ALIAS"
    }
    assert alias_keys == {
        "zoo.app.deliver::Beast",
        "zoo.app.coach_session::coach",
        "zoo.app.stock::factory",
        "zoo.app.enroll::trainer_cls",
    }
    returns = {
        (f["full_name"], f["dst"]) for f in facts if f["fact"] == "returns"
    }
    assert returns == {
        ("zoo.app.make_animal", "Animal"),
        # static inference of the unannotated `return Puppy(...)` shape
        ("zoo.app.breed", "Puppy"),
        # chained factory (r5): `return breed()` emits the callee name;
        # resolution chains it through breed's inferred return class
        ("zoo.app.breed_chain", "breed"),
        # inferred single-ctor-shape returns through local names; they
        # resolve to nothing class-like and stay inert downstream
        ("zoo.app.deliver", "Beast"),
        ("zoo.app.stock", "factory"),
        # unannotated getter: `return self.vet` emits the field's key,
        # chained through the field binding at resolution time
        ("zoo.app.Shelter.resident", "zoo.app.Shelter.vet"),
    }


def test_ref_bind_keys():
    facts = _extract_one("zoo/app.py", dict(mini_repo.DEEP_V1)["zoo/app.py"])
    keys = {
        (f["dst"], f["class"])
        for f in facts
        if f["fact"] == "ref" and f["kind"] == "CALL"
    }
    assert ("pet.speak", "zoo.app.run::pet") in keys
    # self.coach.train rewritten against the class; key = field full name
    assert (
        "zoo.app.Keeper.coach.train",
        "zoo.app.Keeper.coach",
    ) in keys


def test_deep_call_edges(deep_graph):
    _, edges = deep_graph
    calls = {
        (r.src, r.dst)
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    assert calls == {
        # local ctor binding
        ("zoo.app.run", "zoo.animals.Animal.speak"),
        # inherited method through a local binding (method-map hit)
        ("zoo.app.adopt", "zoo.animals.Animal.describe"),
        # direct method on the bound subclass
        ("zoo.app.adopt", "zoo.app.Puppy.lick"),
        # field ctor binding
        ("zoo.app.Keeper.tend", "zoo.animals.Trainer.train"),
        # annotation binding
        ("zoo.app.Keeper.tend", "zoo.animals.Animal.speak"),
        # untyped parameter — the documented gap vs jedi
        ("zoo.animals.Trainer.train", "unsolved symbol"),
        # factory: direct call edge + return-type-propagated method call
        ("zoo.app.visit", "zoo.app.make_animal"),
        ("zoo.app.visit", "zoo.animals.Animal.describe"),
        # unannotated factory: same shape through the INFERRED return type
        ("zoo.app.rehome", "zoo.app.breed"),
        ("zoo.app.rehome", "zoo.app.Puppy.lick"),
        # chained factory (r5, VERDICT item 5): breed_chain() returns
        # breed()'s inferred class one hop through the call — q =
        # breed_chain(); q.lick() resolves like a direct factory binding
        ("zoo.app.breed_chain", "zoo.app.breed"),
        ("zoo.app.foster", "zoo.app.breed_chain"),
        ("zoo.app.foster", "zoo.app.Puppy.lick"),
        # field ctor binding outside __init__ (r4)
        ("zoo.app.Shelter.checkup", "zoo.animals.Trainer.train"),
        # class alias: method call through the alias (r4)
        ("zoo.app.coach_session", "zoo.animals.Trainer.train"),
        # attribute-RHS class alias (za.Trainer) (r4)
        ("zoo.app.enroll", "zoo.animals.Trainer.train"),
        # function alias: bare-name call resolves to the aliased function
        ("zoo.app.stock", "zoo.app.make_animal"),
        # second-level binding: pet = t.recruit() -> pet.describe() (r4)
        ("zoo.app.chain", "zoo.animals.Trainer.recruit"),
        ("zoo.app.chain", "zoo.animals.Animal.describe"),
        # unannotated getter (`return self.vet`): field-return inference +
        # second-level binding resolve v = s.resident(); v.train() (r4)
        ("zoo.app.consult", "zoo.app.Shelter.resident"),
        ("zoo.app.consult", "zoo.animals.Trainer.train"),
        # NOTE deliver (Beast = Animal; Beast("al")) is absent by design:
        # the alias ctor call resolves to the CLASS and the CALL gate
        # drops it like any direct constructor call — no unsolved edge
    }


def test_deep_uses_fields(deep_graph):
    _, edges = deep_graph
    uses = {
        (r.src, r.dst)
        for r in edges.filter(F.col("rel_type") == "USES").collect()
    }
    # self.name inside Animal methods and the Keeper fields resolve as FIELD uses
    assert ("zoo.animals.Animal.describe", "zoo.animals.Animal.name") in uses
    assert ("zoo.app.Keeper.tend", "zoo.app.Keeper.buddy") in uses


def test_last_assignment_wins(spark):
    src = (
        "from zoo.animals import Animal, Trainer\n"
        "def f():\n"
        "    x = Trainer()\n"
        "    x = Animal('a')\n"
        "    return x.speak()\n"
    )
    files = mini_repo.DEEP_V1[:2] + [("zoo/client.py", src)]
    eng = GraphEngine(spark)
    _, edges, _ = eng.build(files_from_pairs(spark, files), "v1")
    calls = {
        (r.src, r.dst)
        for r in edges.filter(
            (F.col("rel_type") == "CALL") & (F.col("src") == "zoo.client.f")
        ).collect()
    }
    assert calls == {("zoo.client.f", "zoo.animals.Animal.speak")}


def test_local_shadowing_suppresses_global_fallback(spark):
    """ADVICE r2 (medium): a local rebind of unknown type — or a parameter
    — named like a ctor-bound module global must NOT resolve through the
    module-global binding. jedi would not fabricate these edges."""
    src = (
        "from zoo.animals import Animal\n"
        "x = Animal('global')\n"
        "def unknown_rebind():\n"
        "    x = external()\n"
        "    return x.speak()\n"
        "def param_shadow(x):\n"
        "    return x.speak()\n"
        "def uses_global():\n"
        "    return x.speak()\n"
    )
    files = mini_repo.DEEP_V1[:2] + [("zoo/client.py", src)]
    eng = GraphEngine(spark)
    _, edges, _ = eng.build(files_from_pairs(spark, files), "v1")
    calls = {
        (r.src, r.dst)
        for r in edges.filter(
            (F.col("rel_type") == "CALL")
            & F.col("src").startswith("zoo.client.")
        ).collect()
    }
    # the unshadowed function DOES resolve through the module global...
    assert ("zoo.client.uses_global", "zoo.animals.Animal.speak") in calls
    # ...the shadowed ones do not
    assert ("zoo.client.unknown_rebind", "zoo.animals.Animal.speak") not in calls
    assert ("zoo.client.param_shadow", "zoo.animals.Animal.speak") not in calls


def test_annotated_parameter_binds(spark):
    """def f(a: Animal): a.speak() resolves through the param annotation —
    the positive side of parameter bindings."""
    src = (
        "from zoo.animals import Animal\n"
        "def greet(a: Animal):\n"
        "    return a.speak()\n"
    )
    files = mini_repo.DEEP_V1[:2] + [("zoo/client.py", src)]
    eng = GraphEngine(spark)
    _, edges, _ = eng.build(files_from_pairs(spark, files), "v1")
    calls = {
        (r.src, r.dst)
        for r in edges.filter(
            (F.col("rel_type") == "CALL") & (F.col("src") == "zoo.client.greet")
        ).collect()
    }
    assert calls == {("zoo.client.greet", "zoo.animals.Animal.speak")}


def test_class_body_annotation_is_field_key(spark):
    """'class C: pet: Animal' emits the C.pet FIELD key, so self.pet.…
    resolves through the class-level annotation (ADVICE r2, dataclass
    idiom)."""
    src = (
        "from zoo.animals import Animal\n"
        "class Shelter:\n"
        "    pet: Animal\n"
        "    def open(self):\n"
        "        return self.pet.speak()\n"
    )
    files = mini_repo.DEEP_V1[:2] + [("zoo/client.py", src)]
    eng = GraphEngine(spark)
    _, edges, _ = eng.build(files_from_pairs(spark, files), "v1")
    calls = {
        (r.src, r.dst)
        for r in edges.filter(
            (F.col("rel_type") == "CALL")
            & (F.col("src") == "zoo.client.Shelter.open")
        ).collect()
    }
    assert calls == {("zoo.client.Shelter.open", "zoo.animals.Animal.speak")}


def _returns_of(src: str) -> set:
    facts = _extract_one("m.py", src)
    return {(f["full_name"], f["dst"]) for f in facts if f["fact"] == "returns"}


def test_inferred_return_edge_cases():
    """_inferred_return is deliberately conservative: only the single
    unambiguous simple-Name constructor shape fires."""
    # fires: single ctor shape, None-guard returns ignored
    assert _returns_of(
        "def f(x):\n"
        "    if x is None:\n"
        "        return None\n"
        "    if not x:\n"
        "        return\n"
        "    return Foo(x)\n"
    ) == {("m.f", "Foo")}
    # two different ctor names -> ambiguous, no fact
    assert _returns_of(
        "def f(x):\n"
        "    if x:\n"
        "        return Foo()\n"
        "    return Bar()\n"
    ) == set()
    # attribute-call return -> someone else's inference, bail entirely
    assert _returns_of(
        "def f(x):\n"
        "    if x:\n"
        "        return Foo()\n"
        "    return x.make()\n"
    ) == set()
    # plain-value return -> bail
    assert _returns_of("def f(x):\n    return x\n") == set()
    # nested def/lambda returns are NOT this function's returns
    assert _returns_of(
        "def f():\n"
        "    def g():\n"
        "        return Bar()\n"
        "    h = lambda: Baz()\n"
        "    return Foo()\n"
    ) >= {("m.f", "Foo")}
    assert ("m.f", "Bar") not in _returns_of(
        "def f():\n    def g():\n        return Bar()\n    return Foo()\n"
    )
    # an explicit annotation wins; no body scan happens
    assert _returns_of(
        "def f() -> Foo:\n    return Bar()\n"
    ) == {("m.f", "Foo")}


# --- round-3 review: shadowing binding forms must poison the fallback ---------

SHADOW_FILES = [
    ("shmod/__init__.py", ""),
    (
        "shmod/app.py",
        "from shmod.lib import Dog\n"
        "dog = Dog()\n"
        "def use_loop(dogs):\n"
        "    for dog in dogs:\n"
        "        dog.bark()\n"
        "def use_with(ctx):\n"
        "    with ctx as dog:\n"
        "        dog.bark()\n"
        "def use_except():\n"
        "    try:\n"
        "        pass\n"
        "    except ValueError as dog:\n"
        "        dog.bark()\n"
        "def use_walrus(maybe):\n"
        "    if (dog := maybe):\n"
        "        dog.bark()\n"
        "def use_aug(x):\n"
        "    dog = 0\n"
        "    dog += x\n"
        "    dog.bark()\n"
        "def use_global():\n"
        "    dog.bark()\n",
    ),
    (
        "shmod/lib.py",
        "class Dog:\n    def bark(self):\n        return 1\n",
    ),
]


def test_local_shadowing_binding_forms_poison_fallback(spark):
    """for/with/except/walrus/augassign rebinds of a name matching a
    ctor-bound module global must NOT resolve through the global (the
    fabricated-edge class of ADVICE r2); an unshadowed use still does."""
    from pyspark.sql import functions as F

    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs

    eng = GraphEngine(spark, small_repo=True)
    nodes, edges, _ = eng.build(files_from_pairs(spark, SHADOW_FILES), "v1")
    calls = {
        (r["src"], r["dst"])
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    bark = "shmod.lib.Dog.bark"
    # the unshadowed module-global use resolves
    assert ("shmod.app.use_global", bark) in calls
    # every shadowing form must NOT fabricate the edge
    for fn in ("use_loop", "use_with", "use_except", "use_walrus", "use_aug"):
        assert (f"shmod.app.{fn}", bark) not in calls, fn


def test_nested_tuple_targets_all_poison(spark):
    from pyspark.sql import functions as F

    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs

    files = [
        ("nt/__init__.py", ""),
        ("nt/lib.py", "class Dog:\n    def bark(self):\n        return 1\n"),
        (
            "nt/app.py",
            "from nt.lib import Dog\n"
            "dog = Dog()\n"
            "def f(pairs):\n"
            "    (a, (dog, c)) = pairs\n"
            "    dog.bark()\n",
        ),
    ]
    eng = GraphEngine(spark, small_repo=True)
    _, edges, _ = eng.build(files_from_pairs(spark, files), "v1")
    calls = {
        (r["src"], r["dst"])
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    assert ("nt.app.f", "nt.lib.Dog.bark") not in calls
