package graft

import graft.export.Plot
import org.apache.spark.sql.functions._

/** The deterministic chart rasterizer (the reference's two validation
  * plots, validate_predictions.py:84-98). The pixel PLACEMENT is
  * oracle-checked (`validation_scatter_raster`,
  * `validation_by_hour_pixels`); these specs pin everything the oracle
  * cannot see: the PNG byte encode (decode-back set equality, byte
  * determinism across layouts), the Bresenham stroke, axis spines, and
  * the degenerate inputs (empty series, zero span).
  */
class PlotSpec extends SparkSpec {
  import spark.implicits._

  private val g = Plot.Geom()

  private def decodePng(bytes: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def pixelsOfColor(img: java.awt.image.BufferedImage, rgb: Int): Set[(Int, Int)] =
    (0 until img.getWidth).flatMap(x => (0 until img.getHeight).collect {
      case y if (img.getRGB(x, y) & 0xffffff) == rgb => (x, y)
    }).toSet

  private val points = Seq(
    (0.0, 0.0), (10.0, 5.0), (5.0, 10.0), (10.0, 10.0),
    (0.0, 10.0), (5.0, 5.0), (5.0, 5.0)) // one overplotted pixel
    .toDF("y_true", "y_pred")

  test("scatterRaster maps extremes to the plot-area corners and counts overplot") {
    val raster = Plot.scatterRaster(points, "y_true", "y_pred", g).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // x: 0→margin, 10→width-1-margin; y: 0→bottom edge, 10→top margin
    assert(raster.contains((g.x0, g.y0))) // (0,0) = bottom-left
    assert(raster.contains((g.width - 1 - g.margin, g.margin))) // (10,10) = top-right
    assert(raster(((g.x0 + g.innerW / 2), (g.y0 - g.innerH / 2))) == 2L) // the (5,5) pair
    assert(raster.size == 6) // 7 points, one collision
    assert(raster.values.sum == 7L)
    // every pixel inside the canvas
    raster.keys.foreach { case (x, y) =>
      assert(x >= g.x0 && x <= g.width - 1 - g.margin)
      assert(y >= g.margin && y <= g.y0)
    }
  }

  test("scatter PNG decode-back: point pixels == raster, spines black, rest white") {
    val raster = Plot.scatterRaster(points, "y_true", "y_pred", g).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    val img = decodePng(Plot.renderScatterPng(raster, g))
    assert(img.getWidth == g.width && img.getHeight == g.height)
    assert(pixelsOfColor(img, Plot.PointColor) == raster.toSet)
    val axes = pixelsOfColor(img, Plot.AxisColor)
    val expectedAxes =
      (g.margin to g.y0).map(y => (g.x0, y)).toSet ++
        (g.x0 to g.width - 1 - g.margin).map(x => (x, g.y0)).toSet
    // a point ON a spine paints over it
    assert(axes == expectedAxes -- raster.toSet)
    val inked = pixelsOfColor(img, Plot.PointColor).size + axes.size
    assert(pixelsOfColor(img, Plot.Background).size == g.width * g.height - inked)
  }

  test("render is byte-deterministic and layout-independent") {
    val a = Plot.scatterRaster(points, "y_true", "y_pred", g).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    val b = Plot.scatterRaster(points.repartition(7), "y_true", "y_pred", g)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(a == b)
    assert(java.util.Arrays.equals(Plot.renderScatterPng(a, g), Plot.renderScatterPng(b, g)))
  }

  test("degenerate spans center; empty series renders axes only") {
    val flat = Seq((3.0, 7.0), (3.0, 7.0)).toDF("y_true", "y_pred")
    val r = Plot.scatterRaster(flat, "y_true", "y_pred", g).collect()
    assert(r.length == 1)
    assert((r(0).getInt(0), r(0).getInt(1), r(0).getLong(2)) ==
      (g.x0 + g.innerW / 2, g.y0 - g.innerH / 2, 2L))
    val empty = Plot.scatterRaster(
      flat.filter(lit(false)), "y_true", "y_pred", g).collect()
    assert(empty.isEmpty)
    val img = decodePng(Plot.renderScatterPng(Seq.empty, g))
    assert(pixelsOfColor(img, Plot.PointColor).isEmpty)
    assert(pixelsOfColor(img, Plot.AxisColor).nonEmpty)
  }

  test("bresenham: cardinal, diagonal, and steep segments, endpoints inclusive") {
    assert(Plot.bresenham(2, 5, 6, 5) == Seq((2, 5), (3, 5), (4, 5), (5, 5), (6, 5)))
    assert(Plot.bresenham(4, 1, 4, 4) == Seq((4, 1), (4, 2), (4, 3), (4, 4)))
    assert(Plot.bresenham(0, 0, 3, 3) == Seq((0, 0), (1, 1), (2, 2), (3, 3)))
    assert(Plot.bresenham(5, 5, 5, 5) == Seq((5, 5)))
    val steep = Plot.bresenham(0, 0, 2, 6)
    assert(steep.head == ((0, 0)) && steep.last == ((2, 6)) && steep.length == 7)
    // symmetric: reversing endpoints yields the reversed pixel walk
    assert(Plot.bresenham(3, 3, 0, 0) == Plot.bresenham(0, 0, 3, 3).reverse)
  }

  test("byHourPixels spreads the hour grid across the plot width") {
    val bh = Seq((0, 2.0), (6, 8.0), (12, 4.0), (23, 6.0))
      .toDF("hour_of_day", "mae")
    val v = Plot.byHourPixels(bh, g).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(v.map(_._1).toSeq == Seq(0, 6, 12, 23)) // hour order
    assert(v.head._2 == g.x0) // hour 0 at the left edge
    assert(v.last._2 == g.x0 + g.innerW) // hour 23 at the right edge
    assert(v.find(_._1 == 6).get._3 == g.margin) // max mae at the top
    assert(v.head._3 == g.y0) // min mae at the bottom
  }

  test("line PNG connects vertices: every vertex inked, segments contiguous") {
    val verts = Seq((g.x0, g.y0), (g.x0 + 100, g.margin + 50), (g.x0 + 200, g.y0 - 10))
    val img = decodePng(Plot.renderLinePng(verts, g))
    val inked = pixelsOfColor(img, Plot.PointColor)
    verts.foreach(v => assert(inked.contains(v)))
    val expected = (verts.head +: verts.sliding(2).collect {
      case Seq((ax, ay), (bx, by)) => Plot.bresenham(ax, ay, bx, by).drop(1)
    }.flatten.toSeq).toSet
    assert(inked == expected)
  }

  test("renderValidationCharts writes both artifacts end to end") {
    val out = java.nio.file.Files.createTempDirectory("plotspec").toString
    val preds = Seq(
      ("r1", java.sql.Timestamp.valueOf("2024-01-01 07:00:00"), 10.0, 9.5),
      ("r1", java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 12.0, 12.6),
      ("r2", java.sql.Timestamp.valueOf("2024-01-01 07:00:00"), 8.0, 7.0))
      .toDF("route_id", "hour_ts", "y_true", "y_pred")
    val (nRaster, nVerts) = Plot.renderValidationCharts(preds, out)
    assert(nRaster == 3L && nVerts == 2L) // 3 distinct pixels, hours {7,8}
    val scatter = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/predicted_vs_observed.png"))
    val line = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/mae_by_hour.png"))
    assert(pixelsOfColor(decodePng(scatter), Plot.PointColor).size == 3)
    assert(pixelsOfColor(decodePng(line), Plot.PointColor).nonEmpty)
    // determinism: a second render is byte-identical
    val out2 = java.nio.file.Files.createTempDirectory("plotspec2").toString
    Plot.renderValidationCharts(preds, out2)
    assert(java.util.Arrays.equals(scatter, java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out2/predicted_vs_observed.png"))))
    assert(java.util.Arrays.equals(line, java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out2/mae_by_hour.png"))))
  }
}
