"""Compiled JVM Catalyst extension (SURVEY section 4 option b).

`MvSubstituteRule.java` is a real `org.apache.spark.sql.catalyst.rules.Rule`
over LogicalPlan -- the PRODUCTION shape of materialized-view rewriting
that the pure-Python RewritingSession (mv/sql_rewrite.py) mirrors at the
query-text layer.  The sandbox has no Scala toolchain, but Catalyst's rule
API is JVM API: the rule is written in Java, compiled at first use with the
JDK's javac against the installed PySpark jars, loaded into the live
driver JVM through a child URLClassLoader (parent-delegating, so it links
against the session's own Spark classes), and installed through
`spark.experimental.extraOptimizations` -- Spark's documented hook for
user-provided optimizer rules on a LIVE session (extensions configured via
`spark.sql.extensions` bind at session construction, which the driver owns).

Matching is Catalyst's own `sameResult` (the CacheManager mechanism), so:

* DIRECT substitution: a user subtree semantically equal to an MV's
  defining query is replaced by the MV scan plus an ExprId-preserving
  Project;
* aggregate NAVIGATION falls out for free: a coarser roll-up optimizes to
  Aggregate(keys) over exactly the defining subtree, the subtree swaps,
  and Catalyst's own outer Aggregate re-aggregates the MV -- the View2
  decision the reference's methodology makes by hand (SURVEY section 2-J).

Column pruning caveat: optimizer rules see OPTIMIZED plans, where an
embedded defining subtree carries only the columns the outer query needs
-- `register_mv` therefore registers the optimized plans of every ordered
column-subset projection of the defining query (2^n - 1 for an n-column
MV; MVs here are <= 4 columns wide).
"""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import subprocess
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "MvSubstituteRule.java")

# one compile per (source mtime) and process -- the javac output directory
_CLASSES: dict[tuple, str] = {}


def _spark_jars_classpath() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")


def build_classes() -> str:
    """Compile MvSubstituteRule.java with the JDK's javac against the
    installed PySpark jars; returns the classes directory.  Memoized per
    source fingerprint and process."""
    st = os.stat(_SRC)
    key = (st.st_mtime_ns, st.st_size)
    cached = _CLASSES.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    javac = shutil.which("javac") or os.path.join(
        os.environ.get("JAVA_HOME", ""), "bin", "javac"
    )
    if not javac or not os.path.exists(javac):
        raise RuntimeError(
            "no javac on PATH or under JAVA_HOME: the compiled Catalyst "
            "rule needs a JDK (the pure-Python RewritingSession in "
            "mv/sql_rewrite.py covers the same semantics without one)"
        )
    out = tempfile.mkdtemp(prefix="pdwx-catalyst-")
    proc = subprocess.run(
        [javac, "-cp", _spark_jars_classpath(), "-d", out, _SRC],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"javac failed compiling MvSubstituteRule.java:\n{proc.stderr}"
        )
    if not glob.glob(os.path.join(out, "pdwx", "*.class")):
        raise RuntimeError("javac produced no classes")
    _CLASSES[key] = out
    return out


# ONE Class object per process: py4j's reflection engine caches resolved
# Methods per class, so every rule instance must come from the SAME
# classloader -- a second loader's pdwx.MvSubstituteRule is a different
# Class and reflective calls throw "object is not an instance of
# declaring class"
_RULE_CLASS: dict[str, object] = {}


def load_rule(spark: SparkSession):
    """Instantiate pdwx.MvSubstituteRule inside the live driver JVM (child
    URLClassLoader over the compiled classes, parent = the context loader
    so Spark's own classes resolve to the session's).  The loaded Class is
    memoized per classes dir and process."""
    classes = build_classes()
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    cls = _RULE_CLASS.get(classes)
    if cls is None:
        urls = gw.new_array(jvm.java.net.URL, 1)
        urls[0] = jvm.java.io.File(classes).toURI().toURL()
        loader = jvm.java.net.URLClassLoader(
            urls, jvm.java.lang.Thread.currentThread().getContextClassLoader()
        )
        cls = loader.loadClass("pdwx.MvSubstituteRule")
        _RULE_CLASS[classes] = cls
    ctor = cls.getDeclaredConstructor(gw.new_array(jvm.java.lang.Class, 0))
    return ctor.newInstance(gw.new_array(jvm.java.lang.Object, 0))


def _optimized(df: DataFrame):
    return df._jdf.queryExecution().optimizedPlan()


def register_mv(rule, defining: DataFrame, replacement: DataFrame) -> int:
    """Register every ordered column-subset projection of (defining ->
    replacement); returns how many plan pairs were registered.  Subsets
    are needed because the optimizer prunes an embedded defining subtree
    to the columns the outer query reads (module docstring)."""
    import itertools

    cols = defining.columns
    if len(cols) > 6:
        raise ValueError(f"MV too wide for subset registration: {cols}")
    n = 0
    for r in range(1, len(cols) + 1):
        for sub in itertools.combinations(cols, r):
            rule.register(
                _optimized(defining.select(*sub)),
                _optimized(replacement.select(*sub)),
            )
            n += 1
    return n


@contextlib.contextmanager
def installed(spark: SparkSession, rule):
    """Install `rule` into this session's experimental.extraOptimizations
    for the duration of the block, restoring the previous rule set on
    exit -- the session is never left mutated (entries run against the
    driver's session family)."""
    em = spark._jsparkSession.experimental()
    prev = em.extraOptimizations()
    set_opts = getattr(em, "extraOptimizations_$eq")
    set_opts(spark._jvm.PythonUtils.toSeq([rule]))
    try:
        yield rule
    finally:
        set_opts(prev)
