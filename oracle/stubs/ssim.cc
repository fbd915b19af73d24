/* Oracle-build replacement for the reference's libx264-linked SSIM.
 *
 * Implements the standard x264-style integer SSIM (4x4 block sums,
 * 8x8 overlapping windows on a 4-pixel grid) so the oracle encoder's
 * quality decisions behave like upstream without linking GPL libx264
 * internals.  This file is part of the *test fixture generator only*.
 */
#include <cstdint>
#include <vector>
#include <algorithm>

#include "ssim.hh"

namespace
{

constexpr int kC1 = 416;     /* .01^2 * 255^2 * 64, rounded */
constexpr int kC2 = 235963;  /* .03^2 * 255^2 * 64 * 63, rounded */

struct BlockSums { int s1, s2, ss, s12; };

BlockSums sums_4x4( const uint8_t * a, size_t stride_a,
                    const uint8_t * b, size_t stride_b )
{
  BlockSums out { 0, 0, 0, 0 };
  for ( int y = 0; y < 4; y++ ) {
    for ( int x = 0; x < 4; x++ ) {
      const int pa = a[ y * stride_a + x ];
      const int pb = b[ y * stride_b + x ];
      out.s1 += pa;
      out.s2 += pb;
      out.ss += pa * pa + pb * pb;
      out.s12 += pa * pb;
    }
  }
  return out;
}

double ssim_one_window( const BlockSums & t )
{
  const double vars = double( t.ss ) * 64 - double( t.s1 ) * t.s1 - double( t.s2 ) * t.s2;
  const double covar = double( t.s12 ) * 64 - double( t.s1 ) * t.s2;
  return ( 2.0 * t.s1 * t.s2 + kC1 ) * ( 2.0 * covar + kC2 )
       / ( ( double( t.s1 ) * t.s1 + double( t.s2 ) * t.s2 + kC1 ) * ( vars + kC2 ) );
}

} // namespace

double ssim( const TwoD<uint8_t> & image, const TwoD<uint8_t> & other_image )
{
  const size_t width = image.width(), height = image.height();
  const uint8_t * pix1 = &image.at( 0, 0 );
  const uint8_t * pix2 = &other_image.at( 0, 0 );

  const size_t bw = width >> 2, bh = height >> 2;

  /* per-4x4-block sums for two adjacent block rows */
  std::vector<BlockSums> row0( bw ), row1( bw );

  double total = 0.0;
  size_t count = 0;

  for ( size_t by = 0; by < bh; by++ ) {
    std::swap( row0, row1 );
    for ( size_t bx = 0; bx < bw; bx++ ) {
      row1[ bx ] = sums_4x4( pix1 + 4 * ( by * width + bx ), width,
                             pix2 + 4 * ( by * width + bx ), width );
    }
    if ( by == 0 ) continue;
    /* 8x8 windows: combine 2x2 groups of 4x4 block sums */
    for ( size_t bx = 0; bx + 1 < bw; bx++ ) {
      BlockSums t {
        row0[ bx ].s1 + row0[ bx + 1 ].s1 + row1[ bx ].s1 + row1[ bx + 1 ].s1,
        row0[ bx ].s2 + row0[ bx + 1 ].s2 + row1[ bx ].s2 + row1[ bx + 1 ].s2,
        row0[ bx ].ss + row0[ bx + 1 ].ss + row1[ bx ].ss + row1[ bx + 1 ].ss,
        row0[ bx ].s12 + row0[ bx + 1 ].s12 + row1[ bx ].s12 + row1[ bx + 1 ].s12 };
      total += ssim_one_window( t );
      count++;
    }
  }

  return count ? total / double( count ) : 1.0;
}
