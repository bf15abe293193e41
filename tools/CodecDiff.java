import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.io.IOException;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.awt.image.WritableRaster;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

/**
 * Independently-authored codec oracle for the jpeg_lite / png_lite
 * differential (tools/codec_differential.py). Wraps the JDK's
 * javax.imageio JPEG and PNG codecs - an implementation that shares no
 * authorship with this repo - behind three byte[]-in / byte[]-out
 * static methods that py4j can call without array plumbing.
 *
 * Wire formats:
 *  - encode inputs: band-interleaved 8-bit samples, channels 1 or 3.
 *  - decode outputs: 12-byte big-endian header (width, height, bands)
 *    followed by band-interleaved samples. decodeRaster emits RAW
 *    raster samples as big-endian uint16 (no color-model conversion -
 *    avoids Java's linear-gray gamma trap on TYPE_BYTE_GRAY /
 *    TYPE_USHORT_GRAY); decodeRgb emits color-model-converted sRGB as
 *    3 uint8 bands (the path that applies PLTE lookup and low-bit-depth
 *    scaling).
 */
public final class CodecDiff {

    private CodecDiff() {}

    public static byte[] encodePng(byte[] samples, int w, int h,
                                   int channels) throws IOException {
        BufferedImage img = toImage(samples, w, h, channels);
        ByteArrayOutputStream bos = new ByteArrayOutputStream();
        if (!ImageIO.write(img, "png", bos)) {
            throw new IOException("no PNG writer");
        }
        return bos.toByteArray();
    }

    public static byte[] encodeJpeg(byte[] samples, int w, int h,
                                    int channels, float quality,
                                    boolean progressive)
            throws IOException {
        BufferedImage img = toImage(samples, w, h, channels);
        ImageWriter writer =
            ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = writer.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(quality);
        if (progressive) {
            p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        }
        ByteArrayOutputStream bos = new ByteArrayOutputStream();
        ImageOutputStream ios = ImageIO.createImageOutputStream(bos);
        writer.setOutput(ios);
        writer.write(null, new IIOImage(img, null, null), p);
        ios.close();
        writer.dispose();
        return bos.toByteArray();
    }

    public static byte[] decodeRaster(byte[] payload) throws IOException {
        BufferedImage img = read(payload);
        Raster r = img.getRaster();
        int w = img.getWidth(), h = img.getHeight(), b = r.getNumBands();
        int[] px = r.getPixels(0, 0, w, h, (int[]) null);
        byte[] out = new byte[12 + 2 * px.length];
        header(out, w, h, b);
        for (int i = 0; i < px.length; i++) {
            out[12 + 2 * i] = (byte) (px[i] >>> 8);
            out[13 + 2 * i] = (byte) px[i];
        }
        return out;
    }

    public static byte[] decodeRgb(byte[] payload) throws IOException {
        BufferedImage img = read(payload);
        int w = img.getWidth(), h = img.getHeight();
        int[] argb = img.getRGB(0, 0, w, h, null, 0, w);
        byte[] out = new byte[12 + 3 * argb.length];
        header(out, w, h, 3);
        for (int i = 0; i < argb.length; i++) {
            out[12 + 3 * i] = (byte) (argb[i] >>> 16);
            out[13 + 3 * i] = (byte) (argb[i] >>> 8);
            out[14 + 3 * i] = (byte) argb[i];
        }
        return out;
    }

    private static BufferedImage read(byte[] payload) throws IOException {
        BufferedImage img =
            ImageIO.read(new ByteArrayInputStream(payload));
        if (img == null) {
            throw new IOException("ImageIO found no decoder");
        }
        return img;
    }

    private static void header(byte[] out, int w, int h, int b) {
        out[0] = (byte) (w >>> 24); out[1] = (byte) (w >>> 16);
        out[2] = (byte) (w >>> 8);  out[3] = (byte) w;
        out[4] = (byte) (h >>> 24); out[5] = (byte) (h >>> 16);
        out[6] = (byte) (h >>> 8);  out[7] = (byte) h;
        out[8] = (byte) (b >>> 24); out[9] = (byte) (b >>> 16);
        out[10] = (byte) (b >>> 8); out[11] = (byte) b;
    }

    private static BufferedImage toImage(byte[] samples, int w, int h,
                                         int channels) {
        if (channels != 1 && channels != 3) {
            throw new IllegalArgumentException(
                "channels must be 1 or 3, got " + channels);
        }
        if (samples.length != w * h * channels) {
            throw new IllegalArgumentException(
                "sample length " + samples.length + " != " + w + "x" + h
                + "x" + channels);
        }
        int type = channels == 1 ? BufferedImage.TYPE_BYTE_GRAY
                                 : BufferedImage.TYPE_3BYTE_BGR;
        BufferedImage img = new BufferedImage(w, h, type);
        WritableRaster r = img.getRaster();
        int[] px = new int[samples.length];
        for (int i = 0; i < px.length; i++) {
            px[i] = samples[i] & 0xFF;
        }
        r.setPixels(0, 0, w, h, px);
        return img;
    }
}
