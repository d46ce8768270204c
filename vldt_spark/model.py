"""Model classes: annotations → compiled schema, built once per class.

Reference parity: ``DataModelMeta`` resolves annotations with
``typing.get_type_hints(include_extras=True)``, splits ClassVars, validates
class attributes at class-definition time
(/root/reference/vldt/models.py:27-55) and the C++ side compiles a
``SchemaCache`` of ``FieldSchema{name, alias, default, type_schema}`` cached
on the class (/root/reference/src/schema/schema.cpp:560-680).

Here the compile happens on the Spark **driver**, once per class:
annotations → ``FieldSpec[]`` → ``StructType`` + constraint ``Column``
builders, cached under ``cls.__vldt_schema__``. Executors only ever see the
resulting expressions / Arrow UDFs.
"""

from __future__ import annotations

import typing
from dataclasses import dataclass, field as dc_field, replace as dc_replace
from typing import Any, ClassVar

from pyspark.sql import types as T

from vldt_spark.fields import Field, UNDEFINED
from vldt_spark.typeschema import TypeNode, compile_type, spark_type
from vldt_spark.validators import collect_validators


@dataclass
class ModelConfig:
    """Engine knobs per model (reference: vldt.Config —
    /root/reference/vldt/config.py). ``deserializer``/``serializer`` hooks
    become column-expression factories (SURVEY.md A26)."""

    # forbid unknown input columns? reference silently ignores extras
    # (/root/reference/src/data_model.cpp:167-212, tests/test_dict.py:195-220)
    ignore_extra: bool = True
    # collect every violation per row (reference collects across fields,
    # fails fast only inside containers — SURVEY.md §4 last row)
    collect_all: bool = True
    # truthiness bool coercion like Python bool(v) (reference A8) instead of
    # strict cast("boolean")
    truthy_bool: bool = True
    # custom deserializers (reference Config(deserializer={to: {from: fn}}),
    # /root/reference/vldt/config.py + src/schema/deserializer.cpp:9-70):
    # field name → Column-expression factory applied to the RAW column
    # BEFORE coercion — pure Catalyst, e.g. a custom date format:
    #   {"when": lambda c: F.try_to_timestamp(c, F.lit("d/M/yyyy"))}
    # use try_* variants: a factory returning null for a non-null input is
    # recorded as a violation row; a RAISING expression would abort the scan
    deserializers: dict = dc_field(default_factory=dict)
    # bounded self-recursion (reference admits cyclic models per-object via
    # forward-ref resolution, /root/reference/vldt/models.py:27-36; a Spark
    # StructType is a finite tree so the repo bounds the depth instead):
    # 0 (default) rejects direct self-reference at compile time with
    # guidance; d >= 1 unrolls the self-reference d levels — each level is a
    # synthesized nested model class, so the whole existing compile /
    # coercion / lineage machinery applies per level — and data nested
    # DEEPER than d becomes a violation row at the cutoff path ("Exceeded
    # max recursion depth ..."), never a silent drop. Mutual recursion
    # (A -> B -> A) stays rejected: bounding it needs a joint budget across
    # classes; model it relationally instead (see the compile-time error).
    max_recursion_depth: int = 0


@dataclass
class FieldSpec:
    name: str
    node: TypeNode
    field: Field
    dtype: T.DataType = dc_field(init=False)

    def __post_init__(self) -> None:
        self.dtype = spark_type(self.node)

    @property
    def required(self) -> bool:
        return not (self.node.is_optional or self.field.has_default)


@dataclass
class CompiledSchema:
    """Per-class compile artifact (reference SchemaCache analogue)."""

    fields: list[FieldSpec]
    struct: T.StructType
    validators: dict[str, list]
    config: ModelConfig
    # field names dropped at a recursion cutoff (max_recursion_depth
    # exhausted): absent from ``struct``; source data present under one of
    # these names is reported as a violation by the nested-model coercer
    pruned_fields: list[str] = dc_field(default_factory=list)

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


def _synth_depth_class(root: type, remaining: int) -> type:
    """Synthesize (and cache on ``root``) the nested model class standing
    for ``root`` with ``remaining`` further self-expansions allowed.

    Each depth level of a self-recursive model is its own class with its
    own compiled schema — the finite unrolling of the recursive type — so
    nested-model coercion, dotted lineage, unions and serializer hooks all
    work per level with zero special-casing. The innermost level
    (remaining == 0) prunes the self-referencing field(s) and records them
    in ``CompiledSchema.pruned_fields``."""
    cache = root.__dict__.get("__vldt_depth_classes__")
    if cache is None:
        cache = {}
        setattr(root, "__vldt_depth_classes__", cache)
    if remaining not in cache:
        # same __name__ on purpose: violation messages say "Expected type
        # <Model>" and must read identically at every depth
        cache[remaining] = ModelMeta(
            root.__name__,
            (root,),
            {
                "__vldt_recursion_root__": root,
                "__vldt_remaining_depth__": remaining,
                "__module__": root.__module__,
                "__qualname__": f"{root.__qualname__}__depth{remaining}",
            },
        )
    return cache[remaining]


def _node_references(node: TypeNode, root: type) -> bool:
    if node.is_model and node.model_cls is root:
        return True
    return any(_node_references(a, root) for a in node.args)


def _bound_recursion(node: TypeNode, root: type, remaining: int):
    """Rewrite direct self-references to depth-bounded synthesized classes.

    Returns ``(node, pruned)``. ``pruned=True`` means the budget is
    exhausted somewhere in this subtree and the whole field must be dropped
    (a container/union arm cannot be half-expressed); the caller records it
    in ``pruned_fields`` so content there becomes a violation, not a drop.
    """
    if node.is_model and node.model_cls is root:
        if remaining <= 0:
            return node, True
        nxt = _synth_depth_class(root, remaining - 1)
        return dc_replace(node, py_type=nxt, model_cls=nxt), False
    if node.args:
        new_args = []
        for a in node.args:
            na, pruned = _bound_recursion(a, root, remaining)
            if pruned:
                return node, True
            new_args.append(na)
        if any(na is not a for na, a in zip(new_args, node.args)):
            return dc_replace(node, args=new_args), False
    return node, False


class ModelMeta(type):
    def __init__(cls, name, bases, ns, **kw):
        super().__init__(name, bases, ns, **kw)
        cls.__vldt_schema_cache__ = None  # lazy; forward refs may not resolve yet
        if name == "Model" and not bases:
            return
        # ClassVar definition-time validation (vldt/models.py:48-55):
        # missing or mistyped class attributes raise at class creation.
        for attr, ann in ns.get("__annotations__", {}).items():
            if typing.get_origin(ann) is ClassVar:
                args = typing.get_args(ann)
                expected = args[0] if args else None
                if attr not in ns and not any(hasattr(b, attr) for b in bases):
                    raise TypeError(f"Missing class attribute '{attr}'")
                if expected is not None and isinstance(expected, type):
                    val = ns.get(attr, getattr(bases[0], attr, None) if bases else None)
                    if val is not None and not isinstance(val, expected):
                        raise TypeError(
                            f"Class attribute '{attr}' expected type "
                            f"{expected.__name__}, got {type(val).__name__}"
                        )


class Model(metaclass=ModelMeta):
    """Declarative validation model. Subclass with type annotations;
    annotate options with ``Field``; add ``@check`` / validators.

    Example::

        class TokenSequence(Model):
            doc_id: str = Field(not_null=True, unique=True, regex=r"^doc-")
            tokens: list[int] = Field(element_ge=0, element_le=50256)
            n_tok: int = Field(ge=1)
            source: str

            @check("n_tok_matches")
            def n_tok_matches(cols):
                return F.size(cols.tokens) == cols.n_tok
    """

    vldt_config: ClassVar[ModelConfig] = ModelConfig()

    @classmethod
    def __vldt_compile__(cls) -> CompiledSchema:
        """Compile + cache (reference get_schema_cached,
        /root/reference/src/schema/schema.cpp:657-680)."""
        cached = cls.__dict__.get("__vldt_schema_cache__")
        if cached is not None:
            return cached
        # recursive model references (Optional["Node"] pointing back at an
        # enclosing model) are representable as Python objects in the
        # reference but NOT as a Spark StructType (schemas are finite
        # trees). Detect the cycle at compile time and say what to do
        # instead of overflowing the stack.
        if cls.__dict__.get("__vldt_compiling__"):
            # reached by INDIRECT cycles (A -> B -> A); direct self-reference
            # is intercepted earlier and either unrolled (max_recursion_depth
            # >= 1) or rejected with the same guidance
            raise TypeError(
                f"Recursive model reference involving {cls.__name__}: a "
                "self/cyclically-referential model has no finite Spark "
                "StructType. A DIRECT self-reference can be unrolled with "
                "vldt_config = ModelConfig(max_recursion_depth=d); for "
                "indirect cycles, model trees relationally (an adjacency "
                "table with (id, parent_id) and a join/iterate pass) or "
                "bound the depth with explicitly nested distinct models."
            )
        cls.__vldt_compiling__ = True
        try:
            return cls.__vldt_compile_inner__()
        finally:
            cls.__vldt_compiling__ = False

    @classmethod
    def __vldt_compile_inner__(cls) -> CompiledSchema:
        hints = typing.get_type_hints(cls, include_extras=True)
        specs: list[FieldSpec] = []
        pruned_names: list[str] = []
        cfg = getattr(cls, "vldt_config", ModelConfig())
        # bounded self-recursion: the root class carries the full budget
        # from its config; synthesized per-depth classes carry what's left
        root = getattr(cls, "__vldt_recursion_root__", cls)
        remaining = cls.__dict__.get("__vldt_remaining_depth__")
        if remaining is None:
            remaining = cfg.max_recursion_depth
        reserved = {"violations", "is_valid", "__v0"}
        for fname, ann in hints.items():
            if typing.get_origin(ann) is ClassVar:
                continue  # ClassVars are not instance fields (models.py:38-46)
            if fname.startswith("_") or fname == "vldt_config":
                continue
            if fname in reserved:
                # engine output columns — a field by this name would be
                # silently shadowed; fail loudly at compile time instead
                raise TypeError(
                    f"Field name '{fname}' is reserved by the validation "
                    f"engine (reserved: {sorted(reserved)})"
                )
            raw = getattr(cls, fname, UNDEFINED)
            # Annotated[T, Field(...)] metadata (modern annotation style):
            # a class-attribute Field still takes precedence
            annotated_field = None
            if typing.get_origin(ann) is not None and hasattr(ann, "__metadata__"):
                for m in ann.__metadata__:
                    if isinstance(m, Field):
                        annotated_field = m
                        break
            if isinstance(raw, Field):
                fld = raw
            elif annotated_field is not None:
                fld = annotated_field
                if raw is not UNDEFINED and not callable(raw):
                    fld = annotated_field  # plain attr alongside Annotated:
                    # Annotated carries constraints; the attr is the default
                    if not fld.has_default:
                        import copy as _copy

                        fld = _copy.copy(annotated_field)
                        fld.default = raw
            elif raw is UNDEFINED or callable(raw):
                fld = Field()
            else:
                # plain class attribute is the default (schema.cpp:442-446)
                fld = Field(default=raw)
            node = compile_type(ann)
            if _node_references(node, root):
                if remaining <= 0 and cls is root:
                    # max_recursion_depth=0 (default): reject the cycle at
                    # compile time exactly as before, now with the bounded
                    # option in the guidance
                    raise TypeError(
                        f"Recursive model reference involving {cls.__name__}:"
                        " a self/cyclically-referential model has no finite "
                        "Spark StructType. Set vldt_config = ModelConfig("
                        "max_recursion_depth=d) to unroll the self-reference"
                        " d levels (deeper data becomes a violation row), "
                        "model trees relationally (an adjacency table with "
                        "(id, parent_id) and a join/iterate pass), or bound "
                        "the depth with explicitly nested distinct models."
                    )
                node, pruned = _bound_recursion(node, root, remaining)
                if pruned:
                    pruned_names.append(fname)
                    continue
            specs.append(FieldSpec(name=fname, node=node, field=fld))
        # every StructField is nullable on purpose: required-ness is a
        # CHECK (violation row), not a schema rejection — a non-nullable
        # field would make Spark error on read instead of quarantining
        struct = T.StructType(
            [T.StructField(s.name, s.dtype, nullable=True) for s in specs]
        )
        compiled = CompiledSchema(
            fields=specs,
            struct=struct,
            validators=collect_validators(cls),
            config=cfg,
            pruned_fields=pruned_names,
        )
        cls.__vldt_schema_cache__ = compiled
        return compiled

    @classmethod
    def __vldt_struct__(cls) -> T.StructType:
        return cls.__vldt_compile__().struct

    @classmethod
    def spark_schema(cls) -> T.StructType:
        return cls.__vldt_struct__()
