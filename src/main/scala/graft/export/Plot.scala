package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic chart rasterization for the reference's two validation
  * plots (src/optimization/validate_predictions.py:84-98 — the
  * predicted-vs-observed scatter and the MAE-by-hour line chart). This
  * was the last unreproduced piece of the reference's validation step:
  * both SERIES have been oracle-exact since r6
  * ([[Export.validationScatterPoints]], [[Export.validationByHour]]);
  * this module reproduces the RENDER itself, without matplotlib.
  *
  * Design, Spark-first and scale-first:
  *
  *   - The data→pixel affine map runs IN-PLAN ([[scatterRaster]]): every
  *     point maps to its canvas pixel with the same double arithmetic in
  *     Spark and DuckDB (identical IEEE-754 op sequence ⇒ bit-identical
  *     floors), then a groupBy(px, py) collapses the series to occupied
  *     pixels. The driver therefore collects AT MOST width×height raster
  *     rows no matter the input size — at 100 TB the canvas is the
  *     bounded thing, the point set is not. No sampling step is needed
  *     for correctness: overplotting is exact aggregation here.
  *   - Rasterization is integer-only (axis lines, point stamping,
  *     Bresenham polylines) into a `BufferedImage`, PNG-encoded through
  *     the JRE's ImageIO — the same no-external-codec discipline as the
  *     multimodal PNG/BMP/WAV legs. Same raster ⇒ same bytes, so the
  *     artifacts are byte-reproducible across partition layouts (spec-
  *     pinned), unlike a matplotlib render which bakes in font/backend
  *     state.
  *   - The pixel PLACEMENT is the oracle-checked part
  *     (`validation_scatter_raster`, `validation_by_hour_pixels`); the
  *     byte-encode step is spec-covered by decoding the PNG back and
  *     comparing the set-pixel set against the collected raster.
  *
  * Matplotlib fidelity kept where it is semantic: 640×480 canvas (the
  * default 6.4"×4.8" figure at 100 dpi), C0 point/line color #1f77b4,
  * left+bottom axis spines. Ticks/labels/titles are text rendering —
  * cosmetic, font-dependent, and deliberately out of scope.
  */
object Plot {

  /** Canvas geometry. `margin` frames the plot area on all sides; data
    * spans the inclusive pixel range [margin, width-1-margin] ×
    * [margin, height-1-margin].
    */
  final case class Geom(width: Int = 640, height: Int = 480, margin: Int = 40) {
    val innerW: Int = width - 1 - 2 * margin
    val innerH: Int = height - 1 - 2 * margin
    val x0: Int = margin // left plot edge (px of the data minimum)
    val y0: Int = height - 1 - margin // bottom plot edge (py of the data minimum)
  }

  val PointColor = 0x1f77b4 // matplotlib C0
  val AxisColor = 0x000000
  val Background = 0xffffff

  /** Data value → 0-based pixel offset along one axis: floor((v - vmin) *
    * inner / span), the affine map both engines compute with the same
    * IEEE double op sequence (subtract, int-promoted multiply, divide,
    * floor — each correctly rounded, so identical inputs give identical
    * pixels). A degenerate span (all values equal) centers the series,
    * matching matplotlib's auto-limits intent without its ±margin
    * heuristics.
    */
  private def axisPx(v: Column, vmin: Column, vmax: Column, inner: Int): Column =
    when(vmax === vmin, lit(inner / 2))
      .otherwise(floor((v - vmin) * lit(inner) / (vmax - vmin)))
      .cast("int")

  /** Scatter series → occupied-pixel raster (px, py, n) — the same
    * data→pixel affine a `plt.scatter` render computes, minus
    * matplotlib's autoscale margin padding (~5% data-limit expansion)
    * and its multi-pixel markers: one pixel per distinct mapped point,
    * with n carrying the overplot count. Bounds come from one 1-row aggregate broadcast
    * back over the series (the established 1-row crossJoin pattern); the
    * output is ≤ width×height rows by construction.
    */
  def scatterRaster(points: DataFrame, xCol: String, yCol: String,
      g: Geom = Geom()): DataFrame = {
    val b = points.agg(
      min(col(xCol)).as("xmin"), max(col(xCol)).as("xmax"),
      min(col(yCol)).as("ymin"), max(col(yCol)).as("ymax"))
    points.crossJoin(broadcast(b))
      .select(
        (lit(g.x0) + axisPx(col(xCol), col("xmin"), col("xmax"), g.innerW))
          .cast("int").as("px"),
        (lit(g.y0) - axisPx(col(yCol), col("ymin"), col("ymax"), g.innerH))
          .cast("int").as("py"))
      .groupBy("px", "py").agg(count(lit(1)).as("n"))
      .orderBy("px", "py")
  }

  /** MAE-by-hour series → polyline vertex pixels (hour_of_day, px, py).
    * The x map is the hour grid (0..23 spread across the plot width);
    * the y map is the same affine floor as the scatter. Input is the
    * oracle-exact [[Export.validationByHour]] frame (≤24 rows).
    */
  def byHourPixels(byHour: DataFrame, g: Geom = Geom()): DataFrame = {
    val b = byHour.agg(min(col("mae")).as("mmin"), max(col("mae")).as("mmax"))
    byHour.crossJoin(broadcast(b))
      .select(
        col("hour_of_day"),
        (lit(g.x0) + floor(col("hour_of_day").cast("double") * lit(g.innerW)
          / lit(23.0)).cast("int")).cast("int").as("px"),
        (lit(g.y0) - axisPx(col("mae"), col("mmin"), col("mmax"), g.innerH))
          .cast("int").as("py"))
      .orderBy("hour_of_day")
  }

  /** Integer Bresenham line rasterization — the deterministic stand-in
    * for matplotlib's anti-aliased Agg stroke (AA would hash-depend on
    * float blending; a 1-px exact line does not). Returns every pixel on
    * the segment, endpoints inclusive.
    */
  def bresenham(x0: Int, y0: Int, x1: Int, y1: Int): Seq[(Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
    val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
    var err = dx + dy
    var x = x0; var y = y0
    while ({ buf += ((x, y)); !(x == x1 && y == y1) }) {
      val e2 = 2 * err
      if (e2 >= dy) { err += dy; x += sx }
      if (e2 <= dx) { err += dx; y += sy }
    }
    buf.toSeq
  }

  /** White canvas with the two axis spines matplotlib draws by default
    * (left + bottom), in black, framing the plot area.
    */
  def blankCanvas(g: Geom): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      g.width, g.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < g.height) {
      var x = 0
      while (x < g.width) { img.setRGB(x, y, Background); x += 1 }
      y += 1
    }
    var i = g.margin
    while (i <= g.y0) { img.setRGB(g.x0, i, AxisColor); i += 1 } // left spine
    var j = g.x0
    while (j <= g.width - 1 - g.margin) { img.setRGB(j, g.y0, AxisColor); j += 1 } // bottom spine
    img
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Stamp the occupied-pixel raster onto a fresh canvas → PNG bytes.
    * Pixels must lie inside the canvas (the in-plan map guarantees it);
    * a stray coordinate fails loudly rather than silently clipping.
    */
  def renderScatterPng(raster: Seq[(Int, Int)], g: Geom = Geom()): Array[Byte] = {
    val img = blankCanvas(g)
    raster.foreach { case (x, y) =>
      require(x >= 0 && x < g.width && y >= 0 && y < g.height,
        s"raster pixel ($x,$y) outside ${g.width}x${g.height} canvas")
      img.setRGB(x, y, PointColor)
    }
    pngBytes(img)
  }

  /** Connect the vertex pixels in order with Bresenham segments → PNG
    * bytes (the `plt.plot` analogue). A single vertex degenerates to a
    * point; an empty series renders axes only.
    */
  def renderLinePng(vertices: Seq[(Int, Int)], g: Geom = Geom()): Array[Byte] = {
    val img = blankCanvas(g)
    val pixels =
      if (vertices.isEmpty) Seq.empty
      else vertices.head +: vertices.sliding(2).collect {
        case Seq((ax, ay), (bx, by)) => bresenham(ax, ay, bx, by).drop(1)
      }.flatten.toSeq
    pixels.foreach { case (x, y) =>
      require(x >= 0 && x < g.width && y >= 0 && y < g.height,
        s"line pixel ($x,$y) outside ${g.width}x${g.height} canvas")
      img.setRGB(x, y, PointColor)
    }
    pngBytes(img)
  }

  /** The validation step's two chart artifacts, end to end: series →
    * in-plan pixel map → bounded collect → rasterize → PNG files.
    * Returns (scatter raster pixels, line vertices) written.
    */
  def renderValidationCharts(predictions: DataFrame, outDir: String,
      g: Geom = Geom()): (Long, Long) = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val raster = scatterRaster(
      Export.validationScatterPoints(predictions), "y_true", "y_pred", g)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/predicted_vs_observed.png"),
      renderScatterPng(raster, g))
    val verts = byHourPixels(Export.validationByHour(predictions), g)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSeq
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/mae_by_hour.png"),
      renderLinePng(verts, g))
    (raster.length.toLong, verts.length.toLong)
  }
}
