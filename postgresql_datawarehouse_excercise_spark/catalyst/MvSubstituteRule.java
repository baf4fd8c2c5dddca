package pdwx;

import java.util.ArrayList;
import java.util.List;

import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.NamedExpression;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Project;
import org.apache.spark.sql.catalyst.rules.Rule;

/**
 * Compiled Catalyst materialized-view substitution rule (SURVEY section 4
 * option b -- the production shape the pure-Python RewritingSession
 * mirrors at the engine layer).
 *
 * Semantics: a registration pairs the OPTIMIZED logical plan of an MV's
 * DEFINING query (over base tables) with the OPTIMIZED plan reading the
 * materialized result.  During optimization (installed through
 * spark.experimental.extraOptimizations -- Spark's documented hook for
 * user optimizer rules on a live session) every subtree of the user plan
 * is tested with Catalyst's own semantic equality, {@code sameResult}
 * (the same mechanism CacheManager uses to swap in InMemoryRelations);
 * a matching subtree is replaced by the MV scan plus a Project aliasing
 * the MV's output columns to the matched subtree's attribute names AND
 * ExprIds, so every reference in the surrounding plan stays valid.
 *
 * Aggregate NAVIGATION falls out of substitution: a coarser roll-up
 * (e.g. per-customer totals over a per-(customer, day) MV) optimizes to
 * Aggregate(customer, ...) over exactly the MV's defining subtree, so
 * the subtree swap leaves Catalyst's own outer Aggregate to do the
 * re-aggregation -- no aggregate rewriting logic lives here at all.
 *
 * Registrations are expected to be OPTIMIZED plans, and column pruning
 * means an embedded defining subtree may carry only a SUBSET of the MV's
 * columns: the Python side registers the optimized plans of the defining
 * query's ordered column-subset projections (mv/catalyst side of
 * mv/sql_rewrite.py documents this contract).
 *
 * The rule is idempotent (the replacement reads the materialized parquet,
 * never the base tables, so a second optimizer pass finds nothing to
 * match) -- safe under the fixed-point batch extraOptimizations runs in.
 */
public class MvSubstituteRule extends Rule<LogicalPlan> {

  private static final class Registration {
    final LogicalPlan defining;
    final LogicalPlan replacement;
    // cheap pre-filter: sameResult canonicalizes and compares whole
    // trees, so candidates are first screened by their output-name
    // signature -- at registry scale (many MVs x column-subset variants)
    // almost every (node, registration) pair is rejected by this string
    // compare instead of a tree walk
    final String outputSignature;

    Registration(LogicalPlan defining, LogicalPlan replacement) {
      this.defining = defining;
      this.replacement = replacement;
      this.outputSignature = signature(defining);
    }
  }

  private static String signature(LogicalPlan plan) {
    scala.collection.immutable.Seq<Attribute> out = plan.output();
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < out.size(); i++) {
      sb.append(out.apply(i).name()).append('\u0001');
    }
    return sb.toString();
  }

  private final List<Registration> registry = new ArrayList<>();
  private int hits = 0;

  /** Register one (defining-query plan, MV-scan plan) pair; both OPTIMIZED. */
  public void register(LogicalPlan defining, LogicalPlan replacement) {
    registry.add(new Registration(defining, replacement));
  }

  public void clear() {
    registry.clear();
    hits = 0;
  }

  /** How many subtrees have been substituted since the last clear(). */
  public int hits() {
    return hits;
  }

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    if (registry.isEmpty()) {
      return plan;
    }
    return rewrite(plan);
  }

  private LogicalPlan rewrite(LogicalPlan node) {
    String sig = signature(node);
    for (Registration reg : registry) {
      if (sig.equals(reg.outputSignature) && node.sameResult(reg.defining)) {
        LogicalPlan remapped = remap(reg.replacement, node);
        if (remapped != node) {
          hits += 1;
          return remapped;
        }
      }
    }
    scala.collection.immutable.Seq<LogicalPlan> children = node.children();
    if (children.isEmpty()) {
      return node;
    }
    List<LogicalPlan> rebuilt = new ArrayList<>(children.size());
    boolean changed = false;
    for (int i = 0; i < children.size(); i++) {
      LogicalPlan child = children.apply(i);
      LogicalPlan next = rewrite(child);
      changed |= next != child;
      rebuilt.add(next);
    }
    if (!changed) {
      return node;
    }
    return node.withNewChildren(toSeq(rebuilt));
  }

  /**
   * Project the replacement's output onto the matched subtree's attribute
   * names and ExprIds (matched BY NAME -- sameResult guarantees the same
   * result set, and MV columns carry distinct names).  Returns the matched
   * node unchanged if any name cannot be mapped (never rewrite unsoundly).
   */
  private LogicalPlan remap(LogicalPlan replacement, LogicalPlan matched) {
    scala.collection.immutable.Seq<Attribute> want = matched.output();
    scala.collection.immutable.Seq<Attribute> have = replacement.output();
    List<NamedExpression> projections = new ArrayList<>(want.size());
    for (int i = 0; i < want.size(); i++) {
      Attribute w = want.apply(i);
      Attribute found = null;
      for (int j = 0; j < have.size(); j++) {
        Attribute h = have.apply(j);
        if (h.name().equals(w.name()) && h.dataType().equals(w.dataType())) {
          found = h;
          break;
        }
      }
      if (found == null) {
        return matched;
      }
      projections.add(
          new Alias(
              found,
              w.name(),
              w.exprId(),
              MvSubstituteRule.<String>emptySeq(),
              scala.Option.empty(),
              MvSubstituteRule.<String>emptySeq()));
    }
    return new Project(toSeq(projections), replacement);
  }

  private static <T> scala.collection.immutable.Seq<T> toSeq(List<T> list) {
    return scala.jdk.javaapi.CollectionConverters.asScala(list).toSeq();
  }

  private static <T> scala.collection.immutable.Seq<T> emptySeq() {
    return scala.jdk.javaapi.CollectionConverters
        .asScala(new ArrayList<T>())
        .toSeq();
  }
}
