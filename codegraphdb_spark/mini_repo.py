"""Deterministic mini-repo fixture (FIXTURES.md §2.1): 2 packages, 7
modules, __init__ re-exports (named + star), a 3-level inheritance chain
(Animal → Dog → Puppy), cross-module calls, a relative import, and one
syntax-error file. v2 changes exactly one file (pkgb/dog.py)."""

from __future__ import annotations

PKGA_INIT = """\
from pkga.base import Animal
from pkga.util import *
"""

PKGA_BASE = """\
GREETING = "hello"

class Animal:
    species = "generic"

    def __init__(self, name):
        self.name = name

    def speak(self):
        return GREETING

    def describe(self):
        return self.species
"""

PKGA_UTIL = """\
def helper(x):
    return x + 1

def shout(x):
    return helper(x)
"""

PKGA_CONSTS = """\
MAX_DEPTH = 3
"""

PKGB_INIT = """\
"""

PKGB_DOG_V1 = """\
from pkga.base import Animal
from pkga.consts import MAX_DEPTH

class Dog(Animal):
    def speak(self):
        return "woof"

    def fetch(self):
        self.speak()
        return MAX_DEPTH
"""

PKGB_DOG_V2 = """\
from pkga.base import Animal
from pkga.consts import MAX_DEPTH

class Dog(Animal):
    def speak(self):
        return "woof woof"

    def fetch(self):
        self.speak()
        return MAX_DEPTH

    def roll(self):
        return self.fetch()
"""

PKGB_PUPPY = """\
from .dog import Dog

class Puppy(Dog):
    def whine(self):
        self.fetch()
        return external_thing()
"""

PKGB_BROKEN = """\
def broken(:
    return
"""

# --- deep-resolution fixture (A4): calls through instance variables -----
# Exercises every propagation shape the join-based deep pass supports:
# local-var ctor binding, instance-field ctor binding, annotation binding,
# an inherited method reached through a binding (method-map hit), and a
# factory-function return-type binding (a = make_animal(); a.describe()).
# Kept SEPARATE from V1/V2 so the long-standing golden oracles above are
# untouched by fixture growth.

DEEP_ANIMALS = """\
class Animal:
    def __init__(self, name):
        self.name = name

    def speak(self):
        return "..."

    def describe(self):
        return self.name


class Trainer:
    def train(self, a):
        return a.speak()

    def recruit(self) -> Animal:
        return Animal("recruit")
"""

DEEP_APP = """\
import zoo.animals as za
from zoo.animals import Animal, Trainer

class Puppy(Animal):
    def lick(self):
        return "lick"


def run():
    pet = Animal("rex")
    return pet.speak()


def adopt():
    pup = Puppy("pup")
    pup.describe()
    return pup.lick()


def make_animal() -> Animal:
    return Animal("new")


def visit():
    a = make_animal()
    return a.describe()


def breed():
    return Puppy("bred")


def rehome():
    p = breed()
    return p.lick()


def breed_chain():
    return breed()


def foster():
    q = breed_chain()
    return q.lick()


class Keeper:
    def __init__(self):
        self.coach = Trainer()
        self.buddy: Animal = None

    def tend(self):
        self.coach.train(self.buddy)
        return self.buddy.speak()


class Shelter:
    def setup(self):
        self.vet = Trainer()

    def resident(self):
        return self.vet

    def checkup(self):
        return self.vet.train(None)


def consult():
    s = Shelter()
    v = s.resident()
    return v.train(None)


def deliver():
    Beast = Animal
    return Beast("al")


def coach_session():
    coach = Trainer
    return coach.train(None)


def stock():
    factory = make_animal
    return factory()


def enroll():
    trainer_cls = za.Trainer
    return trainer_cls.train(None)


def chain():
    t = Trainer()
    pet = t.recruit()
    return pet.describe()
"""

DEEP_V1 = [
    ("zoo/__init__.py", ""),
    ("zoo/animals.py", DEEP_ANIMALS),
    ("zoo/app.py", DEEP_APP),
]

V1 = [
    ("pkga/__init__.py", PKGA_INIT),
    ("pkga/base.py", PKGA_BASE),
    ("pkga/util.py", PKGA_UTIL),
    ("pkga/consts.py", PKGA_CONSTS),
    ("pkgb/__init__.py", PKGB_INIT),
    ("pkgb/dog.py", PKGB_DOG_V1),
    ("pkgb/puppy.py", PKGB_PUPPY),
    ("pkgb/broken.py", PKGB_BROKEN),
]

CHANGE_LIST = ["pkgb/dog.py"]

V2 = [(p, PKGB_DOG_V2 if p == "pkgb/dog.py" else c) for p, c in V1]
V2_CHANGED_ONLY = [(p, c) for p, c in V2 if p in CHANGE_LIST]

# --- import-cycle fixture (circular-import detection) --------------------
# Kept SEPARATE from V1/DEEP_V1 like the deep fixture: g_import_cycles
# extracts it on its own (extraction facts only — no compile), so the
# long-standing census/merge goldens never see these modules. Two genuine
# strongly-connected components (a 3-cycle and a 2-cycle) plus an acyclic
# consumer and a leaf package __init__.

CYCLE_V1 = [
    ("web/__init__.py", ""),
    ("web/routes.py", "from web.models import Item\n\ndef index():\n    return Item()\n"),
    ("web/models.py", "import web.db\n\nclass Item:\n    def save(self):\n        return web.db.put(self)\n"),
    ("web/db.py", "import web.routes\n\ndef put(x):\n    return x\n"),
    ("web/forms.py", "from web.views import render\n\ndef build():\n    return render()\n"),
    ("web/views.py", "import web.forms\n\ndef render():\n    return None\n"),
    ("web/utils.py", "from web.models import Item\n\ndef fresh():\n    return Item()\n"),
]

# --- A4 deep-resolution PARITY fixture (round 9) --------------------------
# Purpose-built to exercise the reference deep indexer's jedi strengths
# (indexer_visitor.py:655-662 resolves every name via Script.goto with
# follow_imports): instance-attribute chains through typed fields,
# cross-file factory returns, property access, and call-chained method
# hops. tools/deep_parity.py runs jedi itself over these sources to
# produce the golden CALL-edge set and scores the join-based resolver
# against it, per shape class. Since r10 these modules are indexed in the
# SAME combined _graph build as V1/DEEP_V1 (one pipeline serves all three
# catalogs); the long-standing goldens never see them because every
# goldens consumer filters out the parity.*-prefixed paths
# (queries/graph.py parity exclusion filters).

PARITY_ENGINE = """\
class Meter:
    def read(self):
        return 7


class Engine:
    def start(self):
        return "vroom"

    def gauge(self) -> Meter:
        return Meter()


def build_engine() -> Engine:
    return Engine()


def default_engine():
    return Engine()
"""

PARITY_CAR = """\
import parity.engine as pe
from parity.engine import Engine, Meter, build_engine, default_engine


class Car:
    def __init__(self):
        self.engine = Engine()
        self.spare = build_engine()
        self.backup = default_engine()

    def drive(self):
        return self.engine.start()

    def check_spare(self):
        return self.spare.start()

    def check_backup(self):
        return self.backup.start()

    def service(self):
        return self.engine.gauge().read()


class Garage:
    def __init__(self):
        self.car = Car()

    def tune(self):
        return self.car.engine.start()

    def deep_check(self):
        return self.car.engine.gauge().read()


class Dashboard:
    def __init__(self):
        self._meter = Meter()

    @property
    def meter(self) -> Meter:
        return self._meter


def check_dash():
    d = Dashboard()
    return d.meter.read()


def make_garage() -> Garage:
    return Garage()


def fleet_check():
    g = make_garage()
    return g.car.engine.start()


def drive_new():
    return make_garage().car.drive()


def loan(e):
    return e.start()


class Depot:
    def helper(self) -> Engine:
        return Engine()

    def work(self):
        return self.helper().start()


def module_head():
    return pe.build_engine().start()
"""

PARITY_V1 = [
    ("parity/__init__.py", ""),
    ("parity/engine.py", PARITY_ENGINE),
    ("parity/car.py", PARITY_CAR),
]

# caller -> shape-class tag, used by tools/deep_parity.py's report
PARITY_CLASSES = {
    "parity.car.Car.drive": "C1 field ctor (one hop)",
    "parity.car.Car.check_spare": "C2 field via annotated cross-file factory",
    "parity.car.Car.check_backup": "C3 field via inferred factory",
    "parity.car.Car.service": "C4 call-chained method hop (x.m().n())",
    "parity.car.Garage.tune": "C5 two-hop field chain (self.a.b.m())",
    "parity.car.Garage.deep_check": "C6 three-hop field chain + call hop",
    "parity.car.check_dash": "C7 property hop (d.prop.m())",
    "parity.car.fleet_check": "C8 local -> field -> field chain",
    "parity.car.drive_new": "C9 factory-call head chain (f().a.m())",
    "parity.car.loan": "C10 untyped parameter (documented residual)",
    "parity.car.Depot.work": "C11 self-method head call (self.m().n())",
    "parity.car.module_head": "C12 module-alias function head (pe.f().m())",
}
