package graft.solvers

/** Minimum-norm solve of symmetric positive-semidefinite k×k systems
  * (Gram matrices) via cyclic Jacobi eigendecomposition.
  *
  * Replaces breeze/LAPACK `pinv` in every per-group solver hot path. Two
  * reasons beyond dependency weight:
  *
  *  1. *Reliability*: the pure-Java F2J LAPACK fallback (no native BLAS in
  *     this container) can enter a non-terminating rescale loop inside
  *     `dlarfg` on pathological input — observed hanging an executor task
  *     for 10+ minutes on a 3×3 Gram. Jacobi sweeps are bounded by
  *     construction (`maxSweeps`), so worst case is a wrong answer on
  *     garbage input, never a hung task — the property that matters when
  *     one stuck core holds a 1000-executor stage.
  *  2. *Startup*: first-touch F2J classloading cost several seconds of
  *     per-JVM warmup that landed on whichever query ran first.
  *
  * Semantics match `np.linalg.lstsq`'s minimum-norm solution (reference
  * neutralization.py:239): eigenvalues below `rcond × λmax` are treated
  * as zero and their components dropped. For the well-conditioned k ≤ ~32
  * Gram systems the solvers produce, Jacobi agrees with the SVD route to
  * machine precision; k is the feature count, so O(k³) per sweep is
  * negligible next to the O(m·k²) Gram accumulation.
  */
object SymSolve {

  /** Eigendecomposition of a symmetric k×k matrix (row-major flat array;
    * input not mutated). Returns (eigenvalues, eigenvectors) with
    * eigenvector j stored in column j of the returned row-major matrix:
    * a = V·diag(w)·Vᵀ. */
  def eigSym(aIn: Array[Double], k: Int): (Array[Double], Array[Double]) = {
    val a = aIn.clone()
    val v = new Array[Double](k * k)
    var d = 0
    while (d < k) { v(d * k + d) = 1.0; d += 1 }
    val maxSweeps = 40
    var sweep = 0
    var done = k <= 1
    while (sweep < maxSweeps && !done) {
      // off-diagonal Frobenius mass relative to the diagonal scale
      var off = 0.0; var diag = 0.0
      var p = 0
      while (p < k) {
        diag += math.abs(a(p * k + p))
        var q = p + 1
        while (q < k) { off += 2.0 * a(p * k + q) * a(p * k + q); q += 1 }
        p += 1
      }
      if (!(math.sqrt(off) > 1e-14 * math.max(diag, Double.MinPositiveValue)))
        done = true
      else {
        p = 0
        while (p < k) {
          var q = p + 1
          while (q < k) {
            val apq = a(p * k + q)
            if (apq != 0.0) {
              val app = a(p * k + p); val aqq = a(q * k + q)
              val tau = (aqq - app) / (2.0 * apq)
              // stable tangent of the rotation angle
              val t =
                if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
                else -1.0 / (-tau + math.sqrt(1.0 + tau * tau))
              val c = 1.0 / math.sqrt(1.0 + t * t)
              val s = t * c
              var i = 0
              while (i < k) {
                val aip = a(i * k + p); val aiq = a(i * k + q)
                a(i * k + p) = c * aip - s * aiq
                a(i * k + q) = s * aip + c * aiq
                i += 1
              }
              i = 0
              while (i < k) {
                val api = a(p * k + i); val aqi = a(q * k + i)
                a(p * k + i) = c * api - s * aqi
                a(q * k + i) = s * api + c * aqi
                val vip = v(i * k + p); val viq = v(i * k + q)
                v(i * k + p) = c * vip - s * viq
                v(i * k + q) = s * vip + c * viq
                i += 1
              }
            }
            q += 1
          }
          p += 1
        }
      }
      sweep += 1
    }
    val w = Array.tabulate(k)(i => a(i * k + i))
    (w, v)
  }

  /** Minimum-norm solution of `g · x = b` for symmetric PSD g (row-major
    * k×k): pinv(g)·b with numpy-style relative eigenvalue cutoff. */
  def pinvSolve(g: Array[Double], b: Array[Double], k: Int,
      rcond: Double = 1e-14): Array[Double] = {
    val (w, v) = eigSym(g, k)
    var wmax = 0.0
    var i = 0
    while (i < k) { wmax = math.max(wmax, math.abs(w(i))); i += 1 }
    val cut = rcond * wmax
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      if (math.abs(w(j)) > cut) {
        // project b onto eigenvector j, scale by 1/λ, accumulate
        var dot = 0.0
        var r = 0
        while (r < k) { dot += v(r * k + j) * b(r); r += 1 }
        val f = dot / w(j)
        r = 0
        while (r < k) { out(r) += f * v(r * k + j); r += 1 }
      }
      j += 1
    }
    out
  }
}
