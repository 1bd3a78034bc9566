package graft

/**
 * Driver-protocol replica (round 11, VERDICT r10 #7): run a FULL
 * [[Verify]] sweep and then [[Bench]] in the SAME JVM, mirroring the
 * invocation whose heavy-tier budget kept going red while standalone
 * idle runs stayed far under it. The r9/r10 breaches were attributed
 * (gc/spill/cpu_share columns) to external host load during the
 * driver's window, but one live hypothesis remained untested: a JVM
 * that has already executed 156 verify queries carries more resident
 * garbage, JIT state, and code-cache pressure into the bench than a
 * fresh one. Committing one of the three per-round stability runs in
 * this shape (bench_runs/) turns that hypothesis into a measured
 * number instead of a driver-round surprise.
 *
 * Args: [verifySfDir] [verifyOutDir] — both optional; Bench reads its
 * usual SPARK_GRAFT_* env. Verify stops its SparkSession; Bench then
 * builds a fresh session in the warm JVM, exactly the sequential-mains
 * shape a driver harness produces.
 */
object VerifyThenBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_verify_out"
    Verify.main(Array(sfDir, outDir))
    Bench.main(Array.empty)
  }
}
