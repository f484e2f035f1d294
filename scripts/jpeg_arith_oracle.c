/* Dev-time interop oracle for the arithmetic-coded JPEG (SOF9) work:
 * a thin wrapper over the SYSTEM libjpeg so the repo's pure-python
 * QM-coder implementations can be validated against a third, widely
 * deployed implementation (ITU-T T.81 Annex D/F).  Not a runtime
 * dependency: tests/test_jpeg_oracle.py compiles this on the fly and
 * skips when gcc or libjpeg headers are absent.
 *
 * Modes:
 *   encode <w> <h> <gray|444|420> <quality> <arith|huff> <restart> <in.raw> <out.jpg>
 *       in.raw = w*h*3 bytes RGB (or w*h bytes when gray)
 *   decode <in.jpg> <out.raw>
 *       out.raw = w*h*3 bytes RGB preceded by an 8-byte LE header (w, h as u32)
 *
 * Build: gcc -O2 -o jpeg_arith_oracle jpeg_arith_oracle.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <jpeglib.h>

static unsigned char *read_all(const char *path, long *n) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(2); }
  if (fseek(f, 0, SEEK_END) != 0) { perror("fseek"); exit(2); }
  *n = ftell(f);
  if (*n < 0) { perror("ftell"); exit(2); }
  if (fseek(f, 0, SEEK_SET) != 0) { perror("fseek"); exit(2); }
  unsigned char *b = malloc(*n > 0 ? (size_t)*n : 1);
  if (!b) { fprintf(stderr, "malloc(%ld) failed\n", *n); exit(2); }
  if (fread(b, 1, *n, f) != (size_t)*n) { perror("fread"); exit(2); }
  fclose(f);
  return b;
}

static int do_encode(int argc, char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]);
  const char *mode = argv[4];
  int quality = atoi(argv[5]);
  int arith = strcmp(argv[6], "arith") == 0;
  int restart = atoi(argv[7]);
  long n;
  unsigned char *raw = read_all(argv[8], &n);
  int gray = strcmp(mode, "gray") == 0;
  int ncomp = gray ? 1 : 3;
  if (n != (long)w * h * ncomp) { fprintf(stderr, "bad raw size\n"); exit(2); }

  struct jpeg_compress_struct c;
  struct jpeg_error_mgr jerr;
  c.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&c);
  unsigned char *buf = NULL; unsigned long sz = 0;
  jpeg_mem_dest(&c, &buf, &sz);
  c.image_width = w; c.image_height = h;
  c.input_components = ncomp;
  c.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = arith ? TRUE : FALSE;
  c.optimize_coding = FALSE;
  c.restart_interval = restart;
  if (!gray) {
    if (strcmp(mode, "444") == 0) {
      c.comp_info[0].h_samp_factor = 1; c.comp_info[0].v_samp_factor = 1;
    } else { /* 420 */
      c.comp_info[0].h_samp_factor = 2; c.comp_info[0].v_samp_factor = 2;
    }
    c.comp_info[1].h_samp_factor = 1; c.comp_info[1].v_samp_factor = 1;
    c.comp_info[2].h_samp_factor = 1; c.comp_info[2].v_samp_factor = 1;
  }
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW rp = raw + (long)c.next_scanline * w * ncomp;
    jpeg_write_scanlines(&c, &rp, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  FILE *f = fopen(argv[9], "wb");
  if (!f) { perror(argv[9]); exit(2); }
  fwrite(buf, 1, sz, f);
  fclose(f);
  free(buf); free(raw);
  return 0;
}

static int do_decode(int argc, char **argv) {
  long n;
  unsigned char *jpg = read_all(argv[2], &n);
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr jerr;
  d.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, jpg, n);
  jpeg_read_header(&d, TRUE);
  d.out_color_space = JCS_RGB;
  jpeg_start_decompress(&d);
  int w = d.output_width, h = d.output_height;
  unsigned char *out = malloc((size_t)w * h * 3);
  if (!out) { fprintf(stderr, "malloc(%ld) failed\n", (long)w * h * 3); exit(2); }
  while ((int)d.output_scanline < h) {
    JSAMPROW rp = out + (long)d.output_scanline * w * 3;
    jpeg_read_scanlines(&d, &rp, 1);
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  FILE *f = fopen(argv[3], "wb");
  if (!f) { perror(argv[3]); exit(2); }
  unsigned char hdr[8] = {
    (unsigned char)(w & 255), (unsigned char)(w >> 8 & 255),
    (unsigned char)(w >> 16 & 255), (unsigned char)(w >> 24 & 255),
    (unsigned char)(h & 255), (unsigned char)(h >> 8 & 255),
    (unsigned char)(h >> 16 & 255), (unsigned char)(h >> 24 & 255),
  };
  fwrite(hdr, 1, 8, f);
  fwrite(out, 1, (long)w * h * 3, f);
  fclose(f);
  free(out); free(jpg);
  return 0;
}

static int do_decodebench(int argc, char **argv) {
  /* decodebench <in.jpg> <iters>: decode the file <iters> times and print
   * "w h iters elapsed_ns" — isolates the codec's own throughput from the
   * process-spawn overhead of the one-shot decode mode, so the measured
   * pure-python-vs-codec Mpx/s ratio (SCALE.md) reflects the codecs, not
   * fork+exec. */
  long n;
  unsigned char *jpg = read_all(argv[2], &n);
  int iters = atoi(argv[3]);
  int w = 0, h = 0;
  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  for (int it = 0; it < iters; it++) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr jerr;
    d.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, jpg, n);
    jpeg_read_header(&d, TRUE);
    d.out_color_space = JCS_RGB;
    jpeg_start_decompress(&d);
    w = d.output_width; h = d.output_height;
    unsigned char *out = malloc((size_t)w * h * 3);
    if (!out) { fprintf(stderr, "malloc failed\n"); exit(2); }
    while ((int)d.output_scanline < h) {
      JSAMPROW rp = out + (long)d.output_scanline * w * 3;
      jpeg_read_scanlines(&d, &rp, 1);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    free(out);
  }
  clock_gettime(CLOCK_MONOTONIC, &t1);
  long long ns = (long long)(t1.tv_sec - t0.tv_sec) * 1000000000LL
               + (t1.tv_nsec - t0.tv_nsec);
  printf("%d %d %d %lld\n", w, h, iters, ns);
  free(jpg);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 10 && strcmp(argv[1], "encode") == 0) return do_encode(argc, argv);
  if (argc >= 4 && strcmp(argv[1], "decode") == 0) return do_decode(argc, argv);
  if (argc >= 4 && strcmp(argv[1], "decodebench") == 0) return do_decodebench(argc, argv);
  fprintf(stderr, "usage: encode w h mode q arith|huff restart in.raw out.jpg"
                  " | decode in.jpg out.raw | decodebench in.jpg iters\n");
  return 1;
}
